"""Deduplication operators — placeholder, filled next."""
