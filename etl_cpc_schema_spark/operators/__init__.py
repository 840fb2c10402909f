"""Relational + scale-extension operators (joins, dedup, similarity, multimodal)."""
