"""Z-order layout (sources/layout.py, r7).

The Morton interleave is replayed bit-for-bit in python; the layout
claim is pinned by reading the written files' parquet FOOTER stats: a
2-D box predicate prunes z-ordered files and cannot prune the
x-sorted layout's second dimension.
"""

from __future__ import annotations

import glob

import pyarrow.parquet as papq
import pytest
from pyspark.sql import functions as F

from australia_company_etl_pipeline_spark.sources import layout

N = 20_000


@pytest.fixture(scope="module")
def xy(spark):
    # two independent uniform-ish dims derived from id arithmetic
    return (spark.range(N)
            .select(F.col("id"),
                    (F.col("id") * 48271 % N).alias("x"),
                    (F.col("id") * 16807 % N).alias("y")))


def _py_z(x: int, y: int, bits: int) -> int:
    out = 0
    for b in range(bits):
        out |= ((x >> b) & 1) << (2 * b)
        out |= ((y >> b) & 1) << (2 * b + 1)
    return out


def test_zorder_value_matches_python_twin(spark):
    bits = 8
    df = spark.createDataFrame(
        [(x, y) for x in (0, 1, 7, 128, 255) for y in (0, 3, 200, 255)],
        "x long, y long")
    got = df.select("x", "y", layout.zorder_value(
        [F.col("x"), F.col("y")], [(0, 255), (0, 255)],
        bits=bits).alias("z")).collect()
    for r in got:
        assert r.z == _py_z(r.x, r.y, bits), (r.x, r.y)


def test_zorder_validation():
    with pytest.raises(ValueError, match="at least 2"):
        layout.zorder_value([F.col("x")], [(0, 1)])
    with pytest.raises(ValueError, match="exceeds a long"):
        layout.zorder_value([F.col("a"), F.col("b"), F.col("c"),
                             F.col("d")], [(0, 1)] * 4, bits=16)


def _files_hit(path: str, box: dict[str, tuple[int, int]]) -> tuple[int, int]:
    """(files whose min-max intersects the box, total files) from
    parquet footers only."""
    files = sorted(glob.glob(f"{path}/part-*.parquet"))
    hit = 0
    for f in files:
        md = papq.ParquetFile(f).metadata
        names = {md.schema.column(i).name: i
                 for i in range(md.num_columns)}
        ok = True
        for col, (lo, hi) in box.items():
            mins, maxs = [], []
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(names[col]).statistics
                mins.append(st.min)
                maxs.append(st.max)
            if min(mins) > hi or max(maxs) < lo:
                ok = False
                break
        if ok:
            hit += 1
    return hit, len(files)


def test_box_query_prunes_zordered_not_xsorted(spark, xy, tmp_path):
    zpath = str(tmp_path / "zord")
    xpath = str(tmp_path / "xsort")
    layout.write_zordered(xy, ["x", "y"], zpath, n_files=16)
    (xy.repartitionByRange(16, "x").sortWithinPartitions("x")
       .write.parquet(xpath))

    box = {"x": (0, N // 8), "y": (0, N // 8)}  # 1/64th of the plane
    z_hit, z_total = _files_hit(zpath, box)
    x_hit, x_total = _files_hit(xpath, box)
    # x-sort prunes on x only: the 2 files covering the x range ALL
    # span full y, so they both survive; z-order must beat the
    # per-dimension product bound meaningfully
    assert z_total >= 8 and x_total >= 8
    assert z_hit <= z_total // 4, (z_hit, z_total)
    assert z_hit <= x_hit

    # and a y-only predicate: x-sort prunes NOTHING, z-order does
    ybox = {"y": (0, N // 8)}
    zy_hit, _ = _files_hit(zpath, ybox)
    xy_hit, x_total2 = _files_hit(xpath, ybox)
    assert xy_hit == x_total2
    assert zy_hit < x_total2


def test_roundtrip_losslessness(spark, xy, tmp_path):
    path = str(tmp_path / "zrt")
    layout.write_zordered(xy, ["x", "y"], path, n_files=8)
    back = spark.read.parquet(path)
    assert back.count() == N
    assert back.columns == xy.columns  # __z dropped
    assert (back.exceptAll(xy).count() == 0
            and xy.exceptAll(back).count() == 0)


def test_explicit_bounds_stay_lazy(spark, xy, tmp_path):
    """With caller bounds the plan carries no extra aggregate: the
    write is the only job (smoke: it just works and clamps
    out-of-bounds values instead of corrupting the key)."""
    path = str(tmp_path / "zb")
    layout.write_zordered(xy, ["x", "y"], path, n_files=4,
                          bounds=[(0, N // 2), (0, N // 2)])
    assert spark.read.parquet(path).count() == N
