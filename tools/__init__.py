"""Offline tooling: chunked graph format, out-of-core partitioning,
verification, cluster launch (reference ``tools/``)."""
