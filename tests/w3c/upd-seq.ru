PREFIX ex: <http://example.org/>
INSERT DATA { ex:x ex:p ex:y } ;
DELETE DATA { ex:a ex:name "Alice" }
