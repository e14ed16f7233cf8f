"""Scalar/vector function helpers shared across operators."""
