PREFIX ex: <http://example.org/>
INSERT { ?s ex:tag _:t } WHERE { ?s ex:p ?o }
