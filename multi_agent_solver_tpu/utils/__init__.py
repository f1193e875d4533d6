"""Host-side utilities: CSV trajectory protocol, CLI parsing, timing."""
