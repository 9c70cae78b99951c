MOVE <urn:g:one> TO <urn:g:two>
