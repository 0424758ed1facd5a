"""WebDataset-style tar shard release — the packaging convention
multimodal training loaders consume (one tar per shard; each sample is
a group of members sharing a key stem: ``<key>.txt``, ``<key>.json``,
``<key>.bin``, ...). Loaders stream shards sequentially, so shard
LAYOUT is the access path — there is no index.

Spark shape: ``repartitionByRange`` on the sample key (balanced,
skew-resistant contiguous key ranges — the same discipline as
``write_sharded_corpus``) + ``sortWithinPartitions``, then ONE
``mapPartitions`` pass writes each partition as one tar. The tar
member bytes are assembled inside the partition iterator — rows stream
through; nothing collects. Shards are byte-DETERMINISTIC: fixed
epoch-0 mtimes, zeroed uid/gid, key-sorted member order, zero-padded
shard numbering from the partition id — re-running the release over
the same input reproduces identical bytes (the reproducibility
contract every release sink in this package carries).

This sandbox writes through the local filesystem (``file:``-style
paths); on a real cluster point ``out_dir`` at a fuse-mounted object
store or swap the ``open()`` for an fsspec filesystem — the layout
logic is the portable part. Binary payload columns ride as-is (the
multimodal convention: ``media.py`` treats media as opaque bytes +
typed metadata); string columns encode UTF-8.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["write_webdataset_shards", "read_webdataset_shard"]


def write_webdataset_shards(df: DataFrame, out_dir: str, key_col: str,
                            members: dict[str, str], shards: int,
                            json_cols: list[str] | None = None,
                            prefix: str = "shard") -> list[str]:
    """Write ``df`` as ``shards`` WebDataset tar files under
    ``out_dir`` → returns the shard paths (driver-side list, length =
    ``shards``).

    ``members`` maps member EXTENSION → source column: a row with key
    ``k`` becomes tar members ``k.<ext>`` in sorted-extension order.
    Binary columns are written as-is, strings UTF-8, anything else via
    ``str()``. ``json_cols`` (optional) adds one ``k.json`` member
    carrying those columns as a JSON object (sorted keys — byte
    determinism). NULL member values are SKIPPED (a sample may lack a
    modality; loaders treat missing members as absent fields).

    Keys must be unique (sample identity) and tar-member-safe (no
    '/') — BOTH enforced: keys are stringified, equal keys range-
    partition together and sort adjacent, so a duplicate raises from
    the writer before any colliding member stems land in a tar (a
    silent duplicate would last-wins-overwrite samples at read time,
    the loud-failure discipline the other release sinks follow)."""
    import io
    import os
    import tarfile

    if shards < 1:
        raise ValueError(f"shards must be >= 1, got {shards}")
    if not members and not json_cols:
        raise ValueError("need at least one member extension or "
                         "json_cols")
    exts = sorted(members)
    cols = ([F.col(key_col).cast("string").alias("__key")]
            + [F.col(members[e]).alias(f"__m_{e}") for e in exts]
            + [F.col(c) for c in (json_cols or [])])
    staged = (df.select(*cols)
              .repartitionByRange(shards, F.col("__key"))
              .sortWithinPartitions("__key"))
    os.makedirs(out_dir, exist_ok=True)
    jcols = list(json_cols or [])
    width = max(5, len(str(shards - 1)))

    def write_partition(it):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        path = os.path.join(out_dir, f"{prefix}-{pid:0{width}d}.tar")
        tmp = f"{path}.__wtmp.{os.getpid()}"
        n = 0

        def add(tf, name, data: bytes):
            info = tarfile.TarInfo(name=name)
            info.size = len(data)
            info.mtime = 0
            info.uid = info.gid = 0
            info.uname = info.gname = ""
            tf.addfile(info, io.BytesIO(data))

        prev_key = None
        with tarfile.open(tmp, "w") as tf:
            for row in it:
                key = row["__key"]
                if key is None or "/" in key:
                    raise ValueError(f"bad webdataset key: {key!r}")
                # keys arrive sorted within the range partition, so a
                # duplicate is always adjacent — O(1) uniqueness guard
                if key == prev_key:
                    raise ValueError(
                        f"duplicate webdataset key {key!r}: keys are "
                        "sample identity; dedupe before writing")
                prev_key = key
                for e in exts:
                    v = row[f"__m_{e}"]
                    if v is None:
                        continue
                    if isinstance(v, (bytes, bytearray)):
                        data = bytes(v)
                    elif isinstance(v, str):
                        data = v.encode("utf-8")
                    else:
                        data = str(v).encode("utf-8")
                    add(tf, f"{key}.{e}", data)
                if jcols:
                    obj = {c: row[c] for c in jcols}
                    add(tf, f"{key}.json",
                        json.dumps(obj, sort_keys=True,
                                   default=str).encode("utf-8"))
                n += 1
        os.replace(tmp, path)  # atomic per shard
        yield (pid, n)

    counts = dict(staged.rdd.mapPartitions(write_partition).collect())
    # range partitioner may produce < `shards` partitions on tiny
    # inputs; emit empty tars for the gap so the shard list is dense
    # (loaders iterate a numbered range)
    paths = []
    for pid in range(shards):
        path = os.path.join(out_dir, f"{prefix}-{pid:0{width}d}.tar")
        if pid not in counts and not os.path.exists(path):
            import tarfile as _tf

            with _tf.open(path, "w"):
                pass
        paths.append(path)
    return paths


def read_webdataset_shard(path: str) -> dict[str, dict[str, bytes]]:
    """Driver-side shard reader for tests/inspection:
    ``{key: {ext: bytes}}`` in member order. NOT a distributed read —
    training loaders consume shards, not Spark."""
    import tarfile

    out: dict[str, dict[str, bytes]] = {}
    with tarfile.open(path, "r") as tf:
        for m in tf.getmembers():
            stem, ext = m.name.rsplit(".", 1)
            out.setdefault(stem, {})[ext] = tf.extractfile(m).read()
    return out
