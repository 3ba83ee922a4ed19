"""Similarity search operators — placeholder, filled next."""
