"""Operators: the engine's jobs and large-scale data-pipeline ops."""
