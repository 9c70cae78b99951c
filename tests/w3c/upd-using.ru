PREFIX ex: <http://example.org/>
INSERT DATA { GRAPH ex:g { ex:u ex:p ex:v } } ;
INSERT { ?s ex:q ?o } USING ex:g WHERE { ?s ex:p ?o }
