PREFIX ex: <http://example.org/>
INSERT DATA { GRAPH ex:g { ex:junk ex:p ex:junk2 } } ;
MOVE DEFAULT TO GRAPH ex:g ;
MOVE GRAPH ex:g TO DEFAULT
