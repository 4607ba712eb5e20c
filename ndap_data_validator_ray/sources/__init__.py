"""Sources: deterministic synthetic clip-table generation and dataset readers."""
