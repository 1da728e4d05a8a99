"""Pipeline orchestration (SURVEY §3 EP1-EP3)."""
