"""Cross-cutting utilities: metrics logging, checkpointing, profiling, seeding."""
