PREFIX ex: <http://example.org/>
INSERT DATA { ex:c ex:p ex:d }
