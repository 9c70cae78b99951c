PREFIX ex: <http://example.org/>
INSERT { ?s ex:short "y" } WHERE { ?s ex:name ?n FILTER(STRLEN(?n) = 3) }
