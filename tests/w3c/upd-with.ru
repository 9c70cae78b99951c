PREFIX ex: <http://example.org/>
INSERT DATA { GRAPH ex:g { ex:u ex:p ex:v } } ;
WITH ex:g INSERT { ?s ex:q ?o } WHERE { ?s ex:p ?o } ;
DELETE WHERE { ?s ?p ?o } ;
INSERT { ?s ?p ?o } USING ex:g WHERE { ?s ?p ?o }
