"""Similarity search over ``embeddings`` (filled in task 5)."""
