"""Scale operators beyond the reference surface: multimodal column
plumbing (``multimodal``) and the skew-resilient salted join (``skew``);
dedup / similarity / text analysis live in ``queries/`` as oracle-gated
relational pipelines."""
