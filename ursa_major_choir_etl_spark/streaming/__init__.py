"""Structured Streaming variants of the analytics (SURVEY §2.11 noted
the reference is strictly batch; these are the engine's extension
surface for the same semantics on unbounded input)."""
