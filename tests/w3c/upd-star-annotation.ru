PREFIX ex: <http://example.org/>
INSERT DATA { ex:a ex:p 1 {| ex:conf 0.9 |} . << ex:b ex:q 2 >> ex:src ex:doc } ;
DELETE { << ?s ex:p ?o >> ex:conf ?c }
INSERT { << ?s ex:p ?o >> ex:conf 1.0 }
WHERE { << ?s ex:p ?o >> ex:conf ?c }
