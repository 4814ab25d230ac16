"""Sizing/admission planner + stored-text retrieval (per-turn text equality
straight from the index artifact — the north rule's row invariant)."""

import pytest
from pyspark.sql import functions as F

from sparkbm25.build import BuildParams
from sparkbm25.corpus import add_doc_id, decode_conv_seq
from sparkbm25.fixtures import make_transcripts_pdf
from sparkbm25.index_query import index_search
from sparkbm25.jobs import Index, build_index
from sparkbm25.planner import admission_check, auto_params, estimate_build


def test_estimate_scales_with_corpus():
    small = estimate_build(1_000_000, 60.0)
    huge = estimate_build(10**12, 60.0)
    assert huge.total_postings > small.total_postings
    assert huge.suggested_num_shards > small.suggested_num_shards
    # task memory bound holds by construction at any size
    assert huge.max_merge_task_bytes <= 256 << 20 or (
        huge.max_merge_task_postings <= 10**12 // huge.suggested_num_shards + 1
    )


def test_admission_refuses_oversized_task():
    est = estimate_build(10**10, 60.0, target_task_bytes=256 << 20)
    est.max_merge_task_bytes = 8 << 30  # simulate a mis-sized plan
    ok, msg = admission_check(est, executor_mem_bytes=4 << 30)
    assert not ok and "num_shards" in msg


def test_auto_params_valid():
    p = auto_params(5_000_000, 62.0, cores=32)
    p.validate()
    assert p.num_shards >= 32
    assert p.lineage_groups <= p.num_shards


def test_stored_text_round_trip(spark, tmp_path):
    """Build with store_text, fetch results' text from the index, assert
    per-turn text equality under (conv_id, turn_idx) ordering."""
    pdf = make_transcripts_pdf(25)
    transcripts = spark.createDataFrame(pdf)
    corpus = add_doc_id(transcripts, "conv_seq").select("doc_id", "text")
    d = str(tmp_path / "ix_text")
    params = BuildParams(num_shards=4, salt_factor=2, num_term_buckets=4,
                         lineage_groups=2, store_text=True)
    build_index(corpus, d, params, "stored")
    ix = Index(spark, d)

    res = index_search(ix, [(0, "w0000 w0001"), (1, "w0100")], k=8)
    with_text = ix.fetch_text(res)
    with_coords = decode_conv_seq(with_text).withColumn(
        "conv_id", F.format_string("conv-%08d", F.col("conv_seq"))
    )
    rows = with_coords.collect()
    assert rows
    orig = {
        (r.conv_id, r.turn_idx): r.text
        for r in transcripts.collect()
    }
    for r in rows:
        assert orig[(r.conv_id, r.turn_idx)] == r.text


def test_fetch_text_refused_without_store(spark, tmp_path):
    pdf = make_transcripts_pdf(5)
    corpus = add_doc_id(spark.createDataFrame(pdf), "conv_seq").select(
        "doc_id", "text"
    )
    d = str(tmp_path / "ix_notext")
    build_index(corpus, d, BuildParams(num_shards=2, salt_factor=1,
                                       num_term_buckets=2, lineage_groups=1),
                "nostore")
    ix = Index(spark, d)
    res = index_search(ix, [(0, "w0000")], k=3)
    with pytest.raises(ValueError, match="store_text"):
        ix.fetch_text(res)
