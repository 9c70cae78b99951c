PREFIX ex: <http://example.org/>
INSERT { GRAPH ex:g { ?s ex:p ?o } } WHERE { ?s ex:p ?o } ;
DELETE WHERE { ?s ex:p ?o } ;
INSERT { ?s ex:q2 ?o } WHERE { GRAPH ex:g { ?s ex:p ?o } }
