"""Gorilla XOR value encoding + delta-of-delta timestamp compression."""

from .gorilla import decode_values, encode_values  # noqa: F401
from .deltadelta import decode_timestamps, encode_timestamps  # noqa: F401
from .roundtrip import (  # noqa: F401
    VALUE_CODECS,
    compressed_tier_roundtrip,
    simple8b_tier_roundtrip,
)
from . import alp, chimp, simple8b  # noqa: F401
from .blobstore import read_compressed_tier, write_compressed_tier  # noqa: F401
from .frontcode import (  # noqa: F401
    frontcode_block,
    frontcode_roundtrip,
    frontdecode_block,
)
from .pla import (  # noqa: F401
    pla_max_error,
    pla_segments_grouped,
    swing_segments,
)
