"""Deterministic synthetic inputs for tests and benchmarks."""

from .series import benchmark_series  # noqa: F401
