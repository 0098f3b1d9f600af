"""Operators beyond the plain DataFrame surface: as-of join, dedup family,
similarity search, text analysis, multimodal plumbing (SURVEY.md §2.B/§2.C)."""
