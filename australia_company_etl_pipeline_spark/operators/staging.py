"""Storage-level policy for staged multi-consumer frames.

Every staged frame in this package (dedup shingle/token frames, BM25
postings + corpus stats, LM token frames, funnel frontiers) is a
corpus-DERIVED projection persisted so several plan branches read one
materialization instead of each replanning the upstream scan. The
staging decision (cache vs recompute) lives with each operator; THIS
module owns only how the cached bytes are held:

- ``MEMORY_AND_DISK`` (default) — right at bench scale: staged frames
  fit executor storage memory and spill is the rare case.
- ``DISK_ONLY`` — the 100-TB recommendation for corpus-sized staged
  frames (a token frame is the same order as the corpus itself):
  holding it in storage memory evicts the working set and forces
  mid-query recomputation of OTHER cached frames; a disk-only cache
  costs one sequential write + reads but never competes with shuffle
  and execution memory. (A ``df.checkpoint`` is the step past that —
  it truncates lineage too — but requires a cluster checkpoint dir;
  the knob keeps that choice with the operator.)

Callers pass ``storage_level=`` to any staging function as a
``pyspark.StorageLevel`` or its name (``"DISK_ONLY"``), or flip the
process-wide default with ``set_default_staging_level`` (e.g. one line
in a 100-TB job's setup), leaving every call site untouched."""

from __future__ import annotations

from pyspark import StorageLevel

_DEFAULT_NAME = "MEMORY_AND_DISK"


def set_default_staging_level(name: str) -> None:
    """Set the process-wide storage level used by staged frames whose
    call sites don't pass an explicit ``storage_level=``."""
    global _DEFAULT_NAME
    if not hasattr(StorageLevel, name):
        raise ValueError(f"unknown StorageLevel {name!r}")
    _DEFAULT_NAME = name


def resolve_level(storage_level=None) -> StorageLevel:
    """Map a ``storage_level=`` argument (None | str | StorageLevel)
    to a concrete ``StorageLevel``; ``None`` means the process-wide
    default (see ``set_default_staging_level``)."""
    if storage_level is None:
        return getattr(StorageLevel, _DEFAULT_NAME)
    if isinstance(storage_level, str):
        if not hasattr(StorageLevel, storage_level):
            raise ValueError(f"unknown StorageLevel {storage_level!r}")
        return getattr(StorageLevel, storage_level)
    return storage_level
