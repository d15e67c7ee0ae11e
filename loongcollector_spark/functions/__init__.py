"""Function library: SPL scalar mapping, text analysis, dedup, similarity."""
