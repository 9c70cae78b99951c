PREFIX ex: <http://example.org/>
INSERT DATA { GRAPH ex:g1 { ex:a ex:p ex:b } GRAPH ex:g2 { ex:c ex:p ex:d } } ;
DELETE WHERE { ?s ?p ?o } ;
INSERT { ?s ex:from ?g } USING NAMED ex:g1 WHERE { GRAPH ?g { ?s ex:p ?o } }
