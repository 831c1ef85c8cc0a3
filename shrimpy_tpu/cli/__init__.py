"""Command-line surface of shrimpy-tpu."""
