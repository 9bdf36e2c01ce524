"""Pipeline parameters for the Series2Graph anomaly pipeline.

Mirrors the reference CLI (reference: bootstrap/command/MasterCommand.java:21-46):
--sub-sequence-length (m), --convolution-size (c), --intersection-segments (S),
--query-length (ell). Canonical values from reference README.md:49-54.
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class S2GParams:
    """Shape constants of one pipeline run.

    m    : sub-sequence length (sliding window over the raw series)
    c    : convolution size (moving-sum width); embedding dim d = m - c
    S    : number of radial intersection segments
    ell  : query path length (scoring window, in edge-creation slots)
    """

    m: int = 50
    c: int = 16
    S: int = 50
    ell: int = 75

    # actor-pool chunk sizes the reference uses; they shape creation-index
    # numbering (intersections) so they are semantic, not just perf knobs.
    # reference: IntersectionWorkFactory.java:18, GraphPartitionCreatorWorkFactory.java:21
    intersection_chunk_size: int = 10000

    def __post_init__(self) -> None:
        if self.c >= self.m:
            raise ValueError("convolution size c must be < sub-sequence length m")
        if self.m < 3 or self.S < 3 or self.ell < 1:
            raise ValueError("degenerate S2G parameters")

    @property
    def d(self) -> int:
        """Embedding dimensionality (columns of the Hankel sequence matrix)."""
        return self.m - self.c


#: canonical parameters from the reference README example invocation
CANONICAL = S2GParams(m=50, c=16, S=50, ell=75)

#: small parameters suited to rolled-up (hourly/daily) series of a few
#: thousand points — same semantics, smaller windows.
ROLLUP = S2GParams(m=20, c=6, S=30, ell=30)
