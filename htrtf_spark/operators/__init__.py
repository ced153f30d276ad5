"""Vectorized operators: each module implements one operator family from
SURVEY.md §2 as Arrow-batched pandas transforms or DataFrame compositions."""
