"""Declarative query plans + the engine's query/oracle registry."""
