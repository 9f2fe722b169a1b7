"""Command-line entry points (parity with the reference CLIs)."""
