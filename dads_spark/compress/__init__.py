"""Gorilla XOR value encoding + delta-of-delta timestamp compression."""

from .gorilla import decode_values, encode_values  # noqa: F401
from .deltadelta import decode_timestamps, encode_timestamps  # noqa: F401
from .roundtrip import VALUE_CODECS, compressed_tier_roundtrip  # noqa: F401
from . import chimp  # noqa: F401
from .blobstore import read_compressed_tier, write_compressed_tier  # noqa: F401
