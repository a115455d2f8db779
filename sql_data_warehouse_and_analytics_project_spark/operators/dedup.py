"""Deduplication operators over ``documents`` (filled in task 5)."""
