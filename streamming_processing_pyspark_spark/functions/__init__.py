"""Scalar / vectorized function library: geo, text, vectors."""
