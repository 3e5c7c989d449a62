"""Relational operators: triple emission, dedup, canonicalization,
and the large-scale training-data toolkit."""
