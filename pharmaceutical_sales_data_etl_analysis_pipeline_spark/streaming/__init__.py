"""Structured Streaming surface (SURVEY.md §2.10): the reference has no
streaming; these are the engine's streaming twins of the batch operators."""
