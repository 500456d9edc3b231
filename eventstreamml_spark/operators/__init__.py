"""Relational / dataflow operator library (SURVEY.md §2 inventory)."""
