"""Relational battery (SURVEY.md Tier D/E) — placeholder, filled next."""
