"""Series2Graph anomaly pipeline: NumPy oracle + distributed Spark build."""

from .params import CANONICAL, ROLLUP, S2GParams  # noqa: F401
from .oracle import OracleResult, s2g_oracle  # noqa: F401
