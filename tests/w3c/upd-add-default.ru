ADD <urn:g:one> TO DEFAULT
