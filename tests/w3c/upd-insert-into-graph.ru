PREFIX ex: <http://example.org/>
INSERT { GRAPH ex:g { ?s ex:p2 ?o } } WHERE { ?s ex:p ?o } ;
DELETE WHERE { ?s ?p ?o } ;
INSERT { ?s ?p ?o } USING ex:g WHERE { ?s ?p ?o }
