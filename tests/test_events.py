"""Events windowed aggs: batch vs DuckDB parity + streaming watermark."""

import datetime as dt

import duckdb
import pytest
from pyspark.sql import functions as F

from sparkbm25.pipeline import events as E

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events(spark):
    df = spark.read.parquet(f"{SF}/events.parquet")
    df.cache().count()
    return df


def _canon(v):
    if isinstance(v, float):
        return round(v, 6)
    if isinstance(v, dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    return v


def _cmp(sdf, sql):
    cols = sorted(sdf.columns)
    got = sorted(tuple(_canon(x) for x in r) for r in sdf.select(*cols).collect())
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM '{SF}/events.parquet'")
    o = con.sql(sql)
    want = sorted(
        tuple(_canon(x) for x in r)
        for r in o.df()[sorted(o.columns)].itertuples(index=False, name=None)
    )
    assert got == want, (got[:2], want[:2])


def test_hourly_rollup_matches_duckdb(events):
    _cmp(E.hourly_rollup(events), E.hourly_rollup_sql())


def test_sessionize_matches_duckdb(events):
    _cmp(E.sessionize(events, 30), E.sessionize_sql(30))


def test_streaming_rollup_with_watermark(spark, events, tmp_path):
    """Feed the events through a real streaming query (file source, one
    availableNow drain); totals must equal the batch rollup."""
    src = str(tmp_path / "ev_src")
    events.write.parquet(src)
    stream = spark.readStream.schema(events.schema).parquet(src)
    out = E.streaming_hourly_rollup(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("ev_rollup")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r.hour, r.event_type): (r.n_events, r.sum_value)
        for r in spark.sql("select * from ev_rollup").collect()
    }
    want = {
        (r.hour, r.event_type): (r.n_events, r.sum_value)
        for r in E.hourly_rollup(events)
        .select(
            F.col("hour"), "event_type", "n_events", "sum_value"
        )
        .collect()
    }
    # append mode emits only windows the watermark has closed; every
    # emitted window must match batch exactly, and most windows must emit
    assert got
    for k, v in got.items():
        assert want[k] == v
    assert len(got) >= len(want) - 3  # at most the tail windows still open


def test_user_topk_tie_break(spark):
    from sparkbm25.pipeline.events import user_topk

    rows = [
        # type a: u1 x3, u2 x3 (tie), u3 x1
        ("a", 1, 1.0), ("a", 1, 1.0), ("a", 1, 1.0),
        ("a", 2, 2.0), ("a", 2, 2.0), ("a", 2, 2.0),
        ("a", 3, 5.0),
        # type b: u9 x2
        ("b", 9, 0.5), ("b", 9, 0.5),
    ]
    df = spark.createDataFrame(rows, "event_type string, user_id long, value double")
    got = {(r.event_type, r.rank): (r.user_id, r.n_events, r.sum_value)
           for r in user_topk(df, 2).collect()}
    assert got[("a", 1)] == (1, 3, 3.0)  # tie at n=3 -> lower user_id first
    assert got[("a", 2)] == (2, 3, 6.0)
    assert got[("b", 1)] == (9, 2, 1.0)
    assert ("b", 2) not in got
