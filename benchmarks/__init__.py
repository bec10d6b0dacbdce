"""Benchmark suite: the five BASELINE.md driver configurations."""
