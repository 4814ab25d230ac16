"""Source format factory + fingerprints + admission gate."""

import pytest
from pyspark.sql import functions as F

from sparkbm25.fixtures import make_transcripts_pdf
from sparkbm25.sources import (
    iceberg_available,
    read_transcripts,
    source_fingerprint,
)


@pytest.fixture(scope="module")
def src_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("src") / "tr.parquet")
    pdf = make_transcripts_pdf(10)
    spark.createDataFrame(pdf).withColumn(
        "turn_idx", F.col("turn_idx").cast("int")
    ).write.parquet(d)
    return d


def test_read_parquet_normalizes_schema(spark, src_dir):
    df = read_transcripts(spark, src_dir, "parquet")
    assert dict(df.dtypes)["turn_idx"] == "int"
    assert dict(df.dtypes)["ts"] == "timestamp"
    assert df.count() > 0


def test_read_csv_casts_types(spark, tmp_path):
    d = str(tmp_path / "tr.csv")
    pdf = make_transcripts_pdf(3)
    spark.createDataFrame(pdf).write.option("header", "true").csv(d)
    df = read_transcripts(spark, d, "csv")
    assert dict(df.dtypes)["turn_idx"] == "int"
    assert df.filter(F.col("turn_idx").isNull()).count() == 0


def test_strict_schema_enforced(spark, tmp_path):
    d = str(tmp_path / "bad.parquet")
    spark.range(3).write.parquet(d)
    with pytest.raises(ValueError, match="missing columns"):
        read_transcripts(spark, d, "parquet")


def test_unknown_format_refused(spark, src_dir):
    with pytest.raises(ValueError, match="unknown source format"):
        read_transcripts(spark, src_dir, "orcx")


def test_iceberg_gracefully_absent(spark, src_dir):
    # the sandbox has no Iceberg runtime; the factory must say so clearly
    if not iceberg_available(spark):
        with pytest.raises(RuntimeError, match="Iceberg"):
            read_transcripts(spark, src_dir, "iceberg")


def test_fingerprint_changes_with_content(spark, src_dir, tmp_path):
    f1 = source_fingerprint(spark, src_dir)
    f2 = source_fingerprint(spark, src_dir)
    assert f1 == f2  # deterministic
    other = str(tmp_path / "other.parquet")
    pdf = make_transcripts_pdf(4)
    spark.createDataFrame(pdf).write.parquet(other)
    assert source_fingerprint(spark, other) != f1


def test_admission_refuses_undersharded_build(spark, tmp_path):
    """A 10^10-doc corpus with 4 shards would put ~2.5e9 postings in one
    merge task — build_index must refuse before launching work."""
    from sparkbm25.build import BuildParams, CorpusStats
    from sparkbm25.corpus import add_doc_id
    from sparkbm25.jobs import build_index

    pdf = make_transcripts_pdf(3)
    corpus = add_doc_id(spark.createDataFrame(pdf), "conv_seq").select(
        "doc_id", "text"
    )
    fake_stats = CorpusStats(
        n_docs=10**10, avgdl=60.0, min_doc=0, max_doc=10**10,
        shard_shift=32,
    )
    with pytest.raises(MemoryError, match="num_shards"):
        build_index(
            corpus, str(tmp_path / "admission_ix"),
            BuildParams(num_shards=4, salt_factor=1, lineage_groups=1),
            "admission", stats_override=fake_stats,
        )
