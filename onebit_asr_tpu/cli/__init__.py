"""Command-line entry points: train, eval, data preparation."""
