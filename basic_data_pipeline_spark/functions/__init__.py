"""Column-expression function library (normalize, hashing, text, vectors)."""
