"""Query plans — the named-query registry the driver contract consumes.

Importing this package populates ``registry.REGISTRY`` with every named
query (operator inventory rows from SURVEY.md §2 plus the training-data
pipeline extensions).
"""

from . import (ann, core, dedup, matching, multimodal,  # noqa: F401
               ops, quality, sources, streaming, temporal, text)
from .registry import REGISTRY, oracles, queries

__all__ = ["REGISTRY", "queries", "oracles"]
