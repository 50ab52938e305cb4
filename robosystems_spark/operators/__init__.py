"""Operator library: graph traversal, dedup, similarity, text, multimodal."""
