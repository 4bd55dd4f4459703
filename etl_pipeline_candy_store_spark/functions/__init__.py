"""Scalar-function helpers (SURVEY §2.8) shared across plans."""
