"""Driver-local DataFrames as JVM LocalRelations (no python workers).

``spark.createDataFrame(list_of_rows)`` in classic PySpark pickles the
rows into a ``parallelize()``d RDD; every action over it then evaluates a
PythonRDD, which takes a python worker from a factory SEPARATE from the
Arrow runners' (the two runner kinds key their worker pools differently).
Two costs follow (measured r07 on the bench host):

- one-time: the first such action in a session boots a second python
  daemon and its worker pool while every task thread of the stage blocks
  in ``SparkEnv.createPythonWorker`` — the first 100-query batch paid a
  uniform ~1.6 s per task (3x the steady-state stage time) with every
  task thread parked in that call;
- steady-state: each action pays a JVM->python->JVM round trip to scan a
  frame of a few hundred bytes.

Converting through pandas + Arrow instead yields a true ``LocalRelation``:
pure JVM, zero python workers, and the optimizer sees concrete rows (so
broadcast-size estimation is exact). Values round-trip through Arrow
without a text detour, so doubles stay bit-identical.
"""

from __future__ import annotations

import pandas as pd


def _ddl_names(schema: str) -> list[str]:
    """Top-level field names of a DDL schema string ("a int, b map<k,v>"):
    split on commas outside <...> nesting, take the leading identifier."""
    names, depth, start = [], 0, 0
    for i, ch in enumerate(schema + ","):
        if ch == "<":
            depth += 1
        elif ch == ">":
            depth -= 1
        elif ch == "," and depth == 0:
            field = schema[start:i].strip()
            if field:
                names.append(field.split()[0])
            start = i + 1
    return names


def local_df(spark, rows, schema: str):
    """Small driver-local DataFrame from ``rows`` (iterable of tuples)
    under a DDL ``schema`` string, built as a JVM LocalRelation via the
    pandas/Arrow path. Falls back to the classic row path if the pandas
    conversion rejects the values (never the other way: the classic path
    accepts everything pandas does)."""
    rows = list(rows)
    try:
        pdf = pd.DataFrame.from_records(rows, columns=_ddl_names(schema))
        return spark.createDataFrame(pdf, schema=schema)
    except Exception:
        return spark.createDataFrame(rows, schema)
