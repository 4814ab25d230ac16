"""Source/sink format factory — the reference's object-store factory analog.

Reference: core/object_store/object_store_factory.py:27-56 dispatches on
repository_type (S3 only) behind an ABC (object_store.py:13-61). Spark's
DataSource registry already IS that factory; this module adds the thin
dispatch + validation layer the engine needs:

- ``read_transcripts``: load the input table from parquet / json / csv /
  iceberg, enforce the input_hint schema (schema-on-read with strict
  validation, the reference's VectorsDataset.parse analog
  vectors_dataset.py:70-84), and normalize column types.
- ``iceberg_available``: probe once whether an Iceberg catalog is configured
  (SURVEY.md §7 risk: the sandbox has no Iceberg runtime jar — degrade to
  parquet + content fingerprint instead of snapshot ids).
- ``source_fingerprint``: the snapshot-id analog used in job ids — Iceberg
  snapshot when available, else path + file listing digest.
"""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

REQUIRED_COLS = {
    "conv_id": "string",
    "turn_idx": "int",
    "role": "string",
    "text": "string",
    "tool": "string",
    "ts": "timestamp",
}

_FORMATS = ("parquet", "json", "csv", "iceberg")


def iceberg_available(spark: SparkSession) -> bool:
    """True if an Iceberg catalog is usable in this session."""
    try:
        exts = spark.conf.get("spark.sql.extensions", "") or ""
        return "IcebergSparkSessionExtensions" in exts
    except Exception:
        return False


def read_transcripts(
    spark: SparkSession, source: str, fmt: str = "parquet",
    strict: bool = True,
) -> DataFrame:
    """Load + validate a transcripts table in the input_hint shape."""
    if fmt not in _FORMATS:
        raise ValueError(f"unknown source format {fmt!r}; one of {_FORMATS}")
    if fmt == "iceberg":
        if not iceberg_available(spark):
            raise RuntimeError(
                "iceberg format requested but no Iceberg catalog is "
                "configured in this session; falling back to parquet is the "
                "caller's choice (see SURVEY.md §7)"
            )
        df = spark.read.format("iceberg").load(source)
    elif fmt == "json":
        df = spark.read.json(source)
    elif fmt == "csv":
        df = spark.read.option("header", "true").csv(source)
    else:
        df = spark.read.parquet(source)

    missing = [c for c in REQUIRED_COLS if c not in df.columns]
    if missing and strict:
        raise ValueError(
            f"transcripts source missing columns {missing}; "
            f"required shape: {REQUIRED_COLS}"
        )
    # normalize types the cheap formats get wrong (csv/json read everything
    # as string; parquet written by other engines may use int64 turn_idx)
    casts = []
    for c in df.columns:
        if c in REQUIRED_COLS:
            casts.append(F.col(c).cast(REQUIRED_COLS[c]).alias(c))
        else:
            casts.append(F.col(c))
    return df.select(*casts)


def source_fingerprint(spark: SparkSession, source: str,
                       fmt: str = "parquet") -> str:
    """Snapshot-id analog for job identity (reference pins vector_path +
    tenant, app/utils/request.py:12-33; Iceberg builds pin snapshot id)."""
    if fmt == "iceberg" and iceberg_available(spark):
        snap = (
            spark.read.format("iceberg")
            .load(f"{source}.snapshots")
            .agg(F.max("snapshot_id"))
            .first()[0]
        )
        return f"iceberg:{source}@{snap}"
    h = hashlib.sha256()
    h.update(source.encode())
    if os.path.isdir(source):
        for name in sorted(os.listdir(source)):
            p = os.path.join(source, name)
            if name.startswith(("_", ".")):
                continue
            st = os.stat(p)
            h.update(f"{name}:{st.st_size}:{int(st.st_mtime)}".encode())
    elif os.path.exists(source):
        # single file: content identity, not just the path — otherwise an
        # overwritten file keeps the old job_id and the idempotent
        # short-circuit serves a stale index
        st = os.stat(source)
        h.update(f"{st.st_size}:{int(st.st_mtime)}".encode())
    return f"{fmt}:{h.hexdigest()}"
