"""Reference-format binary series I/O, text score sink, WARC source."""

from .binary import (  # noqa: F401
    binary_series_df,
    read_binary_series,
    write_binary_series,
    write_scores_text,
)
from .warc import build_warc_record, parse_warc_bytes, read_warc  # noqa: F401
from .tools import (  # noqa: F401
    convert_text_to_binary,
    extract_statistics,
    matrix_diff,
    metrics_report,
    node_diff,
    replicate_series,
    score_diff,
    write_matrix,
    write_nodes,
)
