"""Structured Streaming variants of the rollup operators.

The reference is a batch system (no watermarks/event-time state —
SURVEY.md §2.2), so streaming is an extension, not a parity requirement:
the same hour-tier aggregation expressed as an incremental streaming query
for pipelines that tail a landing zone instead of re-scanning it.
"""

from .windowed import (  # noqa: F401
    run_dedup_stream,
    run_hopping_topk_once,
    run_stream_once,
    sized_state_partitions,
    streaming_hopping_counts,
    streaming_hourly_rollup,
)
from .stateful import (  # noqa: F401
    run_cusum_stream,
    run_scd2_stream,
    run_sessionize_stream,
    run_zscore_stream,
    streaming_cusum,
    streaming_scd2,
    streaming_sessionize,
    streaming_zscore,
)
from .kmvstream import run_kmv_stream  # noqa: F401
from .backfill import (  # noqa: F401
    read_backfill_tier,
    run_tier_backfill_stream,
)
