"""Doc-kind pipelines: parsed rows -> derived columns -> triples."""
