"""Operator library: windowed analytics, relational surface, dedup, similarity, text."""
