"""Physical-plan skeleton extraction — shared by the golden-plan tests
(``tests/test_golden_plans.py``) and the bench harness's sf0.1 plan
guard (``bench.py``), so both compare the SAME normalization of a
formatted explain.

The skeleton is the formatted plan's operator tree: node KINDS and
structure only — node ids and the detail blocks are stripped (ids shift
with any upstream edit; details carry expression ids and file paths).
Any silent plan regression (a new Exchange, a lost BroadcastHashJoin, a
lost WindowGroupLimit, a scan that stopped being an InMemoryTableScan)
shows up as a reviewable text diff."""

from __future__ import annotations

import contextlib
import io
import re

_PY_BOUNDARY_NODES = (
    "ArrowEvalPython",
    "BatchEvalPython",
    "FlatMapGroupsInPandas",
    "MapInPandas",
    "PythonMapInArrow",
    "FlatMapGroupsInPandasWithState",
)


def formatted_plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def plan_skeleton(df) -> str:
    """Operator-tree skeleton of a formatted plan: keep the tree
    section's structure and node names, strip node ids and everything
    after the first blank line."""
    lines = []
    for ln in formatted_plan(df).splitlines():
        if not ln.strip():
            break
        ln = ln.rstrip()
        # AQE reuses stages a builder already materialized (e.g. an
        # index build executed inside the builder), and those tree
        # lines carry run-varying size estimates:
        # "+- BroadcastQueryStage (186), Statistics(sizeInBytes=4.0
        # MiB, rowCount=931)" — strip the Statistics payload, keep the
        # node kind.
        ln = re.sub(r",\s*Statistics\(.*\)\s*$", "", ln)
        # "   +- * HashAggregate (12)" -> "   +- * HashAggregate"
        lines.append(re.sub(r"\s*\(\d+\)\s*$", "", ln))
    return "\n".join(lines) + "\n"


def crosses_python_boundary(plan: str) -> bool:
    """True when the physical plan ships rows across the JVM↔Python
    (Arrow) boundary — such queries are exposed to Python-worker host
    contention that a pure-JVM sentinel cannot see (the r9 bench
    anomaly: the one pandas_udf headline query recorded 4× its builder
    cost while every JVM-only query improved)."""
    return any(node in plan for node in _PY_BOUNDARY_NODES)
