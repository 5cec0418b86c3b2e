"""Optimizers and bi/tri-level architects."""
