"""Bundled data files (public-suffix list snapshot)."""
