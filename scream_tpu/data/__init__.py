"""Placeholder; populated incrementally."""
