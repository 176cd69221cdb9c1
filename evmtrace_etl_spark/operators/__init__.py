"""Relational + domain operators."""
