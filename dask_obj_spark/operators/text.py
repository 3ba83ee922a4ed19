"""Text analysis operators — placeholder, filled next."""
