"""Checkpoint/resume: per-stage manifests with lineage + row counts."""

from .manifest import CheckpointManager, TieredRollupJob, fingerprint  # noqa: F401
