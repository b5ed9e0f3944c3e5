"""Serving runtime: request micro-batching for the query engine."""
