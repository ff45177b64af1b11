"""Sources: interleaved-document span extraction and synthetic corpora."""
