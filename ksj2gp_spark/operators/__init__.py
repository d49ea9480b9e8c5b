"""Spark operators: cell indexing, spatial join/kNN, translation,
dedup/similarity/text pipeline ops, image lane, training-batch
packing (pack.py: sequence concat-and-chunk + aspect buckets)."""
