"""Spark operators: cell indexing, spatial join/kNN, translation,
dedup/similarity/text pipeline ops, image lane."""
