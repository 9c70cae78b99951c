PREFIX ex: <http://example.org/>
INSERT DATA { GRAPH ex:g { ex:x ex:p ex:y } } ;
COPY GRAPH ex:g TO DEFAULT
