"""Operator modules. Importing via registry.load_all() populates the
query registry; each module groups one family from SURVEY.md §2."""
