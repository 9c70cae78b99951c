PREFIX ex: <http://example.org/>
INSERT DATA { GRAPH ex:g2 { ex:z ex:p2 ex:z } } ;
CLEAR DEFAULT ;
INSERT { ?s ?p ?o } WHERE { GRAPH ex:g2 { ?s ?p ?o } }
