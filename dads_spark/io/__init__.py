"""Reference-format binary series I/O + text score sink."""

from .binary import (  # noqa: F401
    binary_series_df,
    read_binary_series,
    write_binary_series,
    write_scores_text,
)
