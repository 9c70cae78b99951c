PREFIX ex: <http://example.org/>
INSERT DATA { GRAPH ex:g1 { ex:m ex:p ex:n } GRAPH ex:g2 { ex:o ex:p ex:q } } ;
CLEAR NAMED ;
INSERT { ?s ex:got ?o } USING NAMED ex:g1 USING NAMED ex:g2 WHERE { GRAPH ?g { ?s ?p ?o } }
