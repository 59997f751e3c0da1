"""Command-line entry points (reference ``scripts/`` parity)."""
