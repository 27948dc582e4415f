"""Command-line entry points (train / infer / minipig / metrics / splits)."""
