"""Multimodal column operators — placeholder, filled next."""
