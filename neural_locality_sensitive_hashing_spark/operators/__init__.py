"""Dataflow operators: candidate generation, verification, clustering."""
