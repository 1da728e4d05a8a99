"""Operators — pure DataFrame -> DataFrame transformations.

Choir-domain parity (SURVEY §2): dims, facts, marts, analytics, quality.
LLM-pipeline extensions (north star): dedup, similarity, text, events,
multimodal.
"""
