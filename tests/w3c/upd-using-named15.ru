PREFIX : <http://example/>
INSERT { ?s :from ?g } USING NAMED <urn:g:one> WHERE { GRAPH ?g { ?s :t ?o } }
