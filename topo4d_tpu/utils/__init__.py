"""Cross-cutting utilities (profiling, tracing)."""
