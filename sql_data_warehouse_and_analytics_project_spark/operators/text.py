"""Text-analysis operators over the ``documents`` table (filled in task 5)."""
