"""Column-expression libraries (pure Catalyst — no Python in the hot path)."""
