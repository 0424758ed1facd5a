"""Golden physical-plan skeletons for every registered query (r9,
VERDICT task 8): the formatted plan's operator tree — node KINDS and
structure only, ids and expressions stripped — is snapshotted under
``tests/golden_plans/``. Any silent plan regression (a new Exchange, a
lost BroadcastHashJoin, a lost WindowGroupLimit, a scan that stopped
being an InMemoryTableScan) shows up as a reviewable text diff instead
of only as a bench drift three rounds later.

Intentional plan changes regenerate the goldens:

    UPDATE_GOLDEN_PLANS=1 python -m pytest tests/test_golden_plans.py

and the regenerated files are reviewed in the commit like any other
golden. Skeletons are taken at the pytest sf_dir (sf0.001) — node
kinds are layout-stable there because the testdata files are fixed
(broadcast decisions come from file-size estimates, which only change
when the testdata regenerates — and then the whole suite reruns)."""

from __future__ import annotations

import contextlib
import difflib
import io
import os
import re

import pytest

from australia_company_etl_pipeline_spark import plans

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden_plans")


def _skeleton(df) -> str:
    """Operator-tree skeleton of a formatted plan: keep the tree
    section's structure and node names, strip node ids (they shift
    with any upstream edit), the detail blocks, and everything after
    the first blank line."""
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    lines = []
    for ln in buf.getvalue().splitlines():
        if not ln.strip():
            break
        # "   +- * HashAggregate (12)" -> "   +- * HashAggregate"
        lines.append(re.sub(r"\s*\(\d+\)\s*$", "", ln.rstrip()))
    return "\n".join(lines) + "\n"


def _release_caches():
    from australia_company_etl_pipeline_spark.operators import (
        cluster as cl_ops,
    )
    from australia_company_etl_pipeline_spark.operators import dedup as dd
    from australia_company_etl_pipeline_spark.operators import lm as lm_ops
    from australia_company_etl_pipeline_spark.operators import (
        retrieval as rt,
    )
    from australia_company_etl_pipeline_spark.operators import (
        temporal as tmp_ops,
    )

    dd.unpersist_shingles()
    rt.unpersist_postings()
    lm_ops.unpersist_lm()
    cl_ops.unpersist_cluster()
    tmp_ops.unpersist_temporal()


@pytest.mark.parametrize("name", sorted(plans.REGISTRY))
def test_plan_skeleton_matches_golden(spark, sf_dir, name):
    try:
        skel = _skeleton(plans.REGISTRY[name].builder(spark, sf_dir))
    finally:
        _release_caches()
    path = os.path.join(GOLDEN_DIR, f"{name}.txt")
    if os.environ.get("UPDATE_GOLDEN_PLANS"):
        os.makedirs(GOLDEN_DIR, exist_ok=True)
        with open(path, "w") as f:
            f.write(skel)
        return
    assert os.path.exists(path), (
        f"no golden plan for {name!r} — run with UPDATE_GOLDEN_PLANS=1 "
        "and review the new skeleton into the commit")
    with open(path) as f:
        want = f.read()
    if skel != want:
        diff = "\n".join(difflib.unified_diff(
            want.splitlines(), skel.splitlines(),
            fromfile=f"golden_plans/{name}.txt", tofile="current",
            lineterm=""))
        raise AssertionError(
            f"plan skeleton changed for {name!r} — if intentional, "
            f"regenerate with UPDATE_GOLDEN_PLANS=1 and review:\n{diff}")
