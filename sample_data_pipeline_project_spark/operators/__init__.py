"""Tier-B operators: dedup, similarity search, text stats, multimodal."""
