"""Reference-format binary series I/O + text score sink."""

from .binary import (  # noqa: F401
    binary_series_df,
    read_binary_series,
    write_binary_series,
    write_scores_text,
)
from .tools import convert_text_to_binary, replicate_series, score_diff  # noqa: F401
