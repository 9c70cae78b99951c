PREFIX : <http://example/>
DELETE { ?s :t ?o } INSERT { ?s :copied ?o } USING <urn:g:one> WHERE { ?s :t ?o }
