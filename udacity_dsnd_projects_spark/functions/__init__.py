"""Scalar-function surface (SURVEY.md §2.7) and the training-data
pipeline extensions (text analysis, dedup, similarity)."""
