PREFIX ex: <http://example.org/>
INSERT DATA { GRAPH ex:g { ex:x ex:p ex:y . ex:x ex:keep ex:z } } ;
DELETE { GRAPH ex:g { ?s ex:p ?o } } WHERE { GRAPH ex:g { ?s ex:p ?o } } ;
DELETE WHERE { ?s ?p ?o } ;
INSERT { ?s ?p ?o } USING ex:g WHERE { ?s ?p ?o }
