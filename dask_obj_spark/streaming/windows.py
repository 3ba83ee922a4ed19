"""Streaming window operators — placeholder, filled next."""
