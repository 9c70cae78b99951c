PREFIX ex: <http://example.org/>
INSERT DATA { GRAPH ex:g { ex:k ex:p ex:v } } ;
DROP DEFAULT ;
INSERT { ?s ?p ?o } USING ex:g WHERE { ?s ?p ?o }
