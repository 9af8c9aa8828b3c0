"""Resumable partitioned writes with per-partition lineage manifests.

north_rule requirement: jobs "resume from per-partition checkpoints with
lineage manifests (partition id, input snapshot, row counts, feature
checksums)". The reference's analogue is chunk-boundary restartability of its
pull-based parsers (every accumulator is complete at chunk boundaries, e.g.
``json/src/main/scala/fs2/data/json/internal/JsonTokenParser.scala:38-47``).

Design (no Iceberg jars in-sandbox, so snapshot ids are content hashes):

- the output is partitioned by a bucket column (``pmod(xxhash64(key), n)``) —
  deterministic, so a re-run reproduces the same partition contents;
- each completed bucket gets ``manifest/part-<i>.json`` recording partition
  id, input snapshot id, row count, and an order-insensitive xor checksum of
  row hashes (cheap, distributed, and permutation-safe);
- ``resume_plan`` diffs manifests against the requested buckets so a restart
  recomputes only missing/invalid buckets — writes are idempotent
  (dynamic partition overwrite of exactly that bucket).
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import asdict, dataclass

from pyspark.sql import DataFrame, SparkSession, functions as F

BUCKET_COL = "__bucket"


@dataclass
class PartitionManifest:
    partition_id: int
    input_snapshot: str
    row_count: int
    checksum: str
    written_at: float


def with_bucket(df: DataFrame, key: str, n_buckets: int) -> DataFrame:
    return df.withColumn(BUCKET_COL, F.pmod(F.xxhash64(F.col(key)), F.lit(n_buckets)))


def input_snapshot_id(df: DataFrame) -> str:
    """Content-hash snapshot id of an input (stands in for an Iceberg
    snapshot): xor of row hashes — order- and partitioning-insensitive."""
    row = df.select(
        F.xxhash64(F.struct(*[F.col(c) for c in df.columns])).alias("h")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.expr("bit_xor(h)").alias("s"),
    ).first()
    return f"{row.n}-{(row.s or 0) & 0xFFFFFFFFFFFFFFFF:016x}"


def _manifest_dir(path: str) -> str:
    return os.path.join(path, "_manifests")


def _manifest_path(path: str, pid: int) -> str:
    return os.path.join(_manifest_dir(path), f"part-{pid}.json")


def completed_partitions(path: str) -> dict[int, PartitionManifest]:
    d = _manifest_dir(path)
    out: dict[int, PartitionManifest] = {}
    if not os.path.isdir(d):
        return out
    for f in os.listdir(d):
        if f.startswith("part-") and f.endswith(".json"):
            with open(os.path.join(d, f)) as fh:
                m = PartitionManifest(**json.load(fh))
            out[m.partition_id] = m
    return out


def resume_plan(path: str, n_buckets: int, input_snapshot: str) -> list[int]:
    """Buckets still to compute: missing manifests, plus manifests written
    from a different input snapshot (stale lineage -> recompute)."""
    done = completed_partitions(path)
    return [b for b in range(n_buckets)
            if b not in done or done[b].input_snapshot != input_snapshot]


def write_partition(
    df_bucketed: DataFrame,
    path: str,
    bucket: int,
    input_snapshot: str,
) -> PartitionManifest:
    """Idempotently (over)write one bucket + its manifest. The manifest is
    written AFTER the data: a crash between the two leaves a recomputable
    bucket, never a wrong manifest."""
    part = df_bucketed.filter(F.col(BUCKET_COL) == bucket).drop(BUCKET_COL)
    target = os.path.join(path, f"bucket={bucket}")
    part.write.mode("overwrite").parquet(target)

    stats = part.select(
        F.xxhash64(F.struct(*[F.col(c) for c in part.columns])).alias("h")
    ).agg(F.count(F.lit(1)).alias("n"), F.expr("bit_xor(h)").alias("s")).first()
    m = PartitionManifest(
        partition_id=bucket,
        input_snapshot=input_snapshot,
        row_count=int(stats.n),
        checksum=f"{(stats.s or 0) & 0xFFFFFFFFFFFFFFFF:016x}",
        written_at=time.time(),
    )
    os.makedirs(_manifest_dir(path), exist_ok=True)
    tmp = _manifest_path(path, bucket) + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(asdict(m), fh)
    os.replace(tmp, _manifest_path(path, bucket))  # atomic publish
    return m


def run_resumable(
    df: DataFrame,
    path: str,
    key: str,
    n_buckets: int = 16,
    input_snapshot: str | None = None,
) -> dict:
    """Compute/refresh all stale buckets; returns a summary. A re-invocation
    after a crash (or with unchanged input) only touches missing buckets."""
    snap = input_snapshot or input_snapshot_id(df)
    todo = resume_plan(path, n_buckets, snap)
    bucketed = with_bucket(df, key, n_buckets)
    if todo:
        # one cached pass feeds every remaining bucket write
        bucketed = bucketed.persist()
    written = [write_partition(bucketed, path, b, snap) for b in todo]
    if todo:
        bucketed.unpersist()
    return {
        "input_snapshot": snap,
        "n_buckets": n_buckets,
        "computed": [m.partition_id for m in written],
        "skipped": [b for b in range(n_buckets) if b not in todo],
        "rows_written": sum(m.row_count for m in written),
    }


def read_resumable(spark: SparkSession, path: str) -> DataFrame:
    """Read back a resumable dataset (bucket partition pruning applies)."""
    return spark.read.option("basePath", path).parquet(os.path.join(path, "bucket=*"))


def verify_manifests(spark: SparkSession, path: str) -> list[int]:
    """Re-checksum each bucket against its manifest; returns corrupt ids."""
    bad = []
    for pid, m in completed_partitions(path).items():
        part = spark.read.parquet(os.path.join(path, f"bucket={pid}"))
        stats = part.select(
            F.xxhash64(F.struct(*[F.col(c) for c in part.columns])).alias("h")
        ).agg(F.count(F.lit(1)).alias("n"), F.expr("bit_xor(h)").alias("s")).first()
        chk = f"{(stats.s or 0) & 0xFFFFFFFFFFFFFFFF:016x}"
        if stats.n != m.row_count or chk != m.checksum:
            bad.append(pid)
    return bad
