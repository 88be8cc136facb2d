"""ASV-style benchmark suite (reference ``benchmarks/``)."""
