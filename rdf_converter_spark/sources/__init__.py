"""Sources: the canonical ``web_pages`` table and payload parsers."""
