"""Declarative query plans — the engine's relational read surface."""
