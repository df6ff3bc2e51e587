"""Scale operators beyond the reference surface: multimodal column
plumbing (dedup / similarity / text analysis live in ``queries/`` as
oracle-gated relational pipelines)."""
