"""Training-data pipeline ops: dedup, similarity, textstats, multimodal."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from sparkbm25.pipeline import dedup as D
from sparkbm25.pipeline import multimodal as M
from sparkbm25.pipeline import similarity as S
from sparkbm25.pipeline import textstats as T

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    df = spark.read.parquet(f"{SF}/documents.parquet")
    df.cache().count()
    return df


@pytest.fixture(scope="module")
def emb(spark):
    df = spark.read.parquet(f"{SF}/embeddings.parquet")
    df.cache().count()
    return df


# --- dedup -----------------------------------------------------------------

def test_exact_dedup_identical_rows(spark):
    df = spark.createDataFrame(
        [(1, "a b c"), (2, "A  b C!"), (3, "different text")],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in D.exact_dedup(df).collect()}
    # 1 and 2 normalize identically -> same group, canonical = min id
    assert rows[1].text_hash == rows[2].text_hash
    assert rows[2].canonical_doc_id == 1 and rows[2].is_dup == 1
    assert rows[1].is_dup == 0 and rows[3].is_dup == 0


def test_minhash_lsh_equals_exact_jaccard(docs):
    exact = {
        (r.doc_a, r.doc_b): r.jaccard for r in D.jaccard_pairs(docs, 0.5).collect()
    }
    lsh = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in D.minhash_lsh_pairs(docs, 0.5).collect()
    }
    assert lsh == exact
    assert len(exact) > 0  # fixture data has real near-dups


def test_minhash_signature_shape(docs):
    r = D.minhash_signature(docs).first()
    assert len(r.sig) == D.MH_ROWS * D.MH_BANDS
    assert all(0 <= v < D.MH_P for v in r.sig)


def test_simhash_pairs_pigeonhole_exact(spark, docs):
    """Banding must find exactly the brute-force hamming<=3 set."""
    sh = D.simhash(docs)
    a = sh.alias("a")
    b = sh.alias("b")
    brute = (
        a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .withColumn(
            "h", F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
        )
        .filter(F.col("h") <= 3)
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("h").alias("hamming"),
        )
    )
    want = {(r.doc_a, r.doc_b, r.hamming) for r in brute.collect()}
    got = {(r.doc_a, r.doc_b, r.hamming)
           for r in D.simhash_pairs(docs, 3).collect()}
    assert got == want


def test_shingles_short_doc(spark):
    df = spark.createDataFrame([(1, "a b"), (2, "a b c"), (3, "")],
                               "doc_id long, text string")
    rows = {r.doc_id: r.sh for r in
            df.select("doc_id", D.shingles_col().alias("sh")).collect()}
    assert rows[1] == []          # < n tokens
    assert rows[2] == ["a b c"]
    assert rows[3] == []


# --- similarity --------------------------------------------------------------

def test_cosine_topk_self_is_rank1(emb):
    out = S.cosine_topk(emb, [0, 7], k=3).collect()
    r1 = {r.query_vec_id: r.vec_id for r in out if r.rank == 1}
    assert r1 == {0: 0, 7: 7}
    assert all(abs(r.cos - 1.0) < 1e-6 for r in out if r.rank == 1)


def test_ivf_full_probe_equals_brute(emb):
    brute = [(r.query_vec_id, r.rank, r.vec_id)
             for r in S.cosine_topk(emb, [1, 2], k=5).collect()]
    ivf = [(r.query_vec_id, r.rank, r.vec_id)
           for r in S.ivf_topk(emb, [1, 2], k=5, n_centroids=8, n_probe=8).collect()]
    assert sorted(ivf) == sorted(brute)


def test_ivf_partial_probe_recall(emb):
    brute = {(r.query_vec_id, r.vec_id)
             for r in S.cosine_topk(emb, [0, 1, 2, 3, 4], k=10).collect()}
    ivf = S.ivf_topk(emb, [0, 1, 2, 3, 4], k=10, n_centroids=8, n_probe=4).collect()
    hits = sum(1 for r in ivf if (r.query_vec_id, r.vec_id) in brute)
    assert hits / len(brute) >= 0.8  # ANN quality gate (recall@10)


def test_cosine_pairs_symmetric_threshold(emb):
    rows = S.cosine_pairs(emb, 0.4).collect()
    assert len(rows) > 0
    assert all(r.vec_a < r.vec_b and r.cos >= 0.4 for r in rows)


# --- textstats ---------------------------------------------------------------

def test_token_counts_edges(spark):
    df = spark.createDataFrame(
        [(1, "one two  three"), (2, ""), (3, None), (4, "   ")],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in T.token_counts(df).collect()}
    assert rows[1].n_tokens == 3 and rows[1].n_ws_tokens == 3
    for d in (2, 3, 4):
        assert rows[d].n_tokens == 0 and rows[d].n_ws_tokens == 0


def test_lang_id_profiles(spark):
    df = spark.createDataFrame(
        [(1, "the cat and the dog is here"), (2, "der hund und die katze ist da"),
         (3, "xyzzy plugh")],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r.lang_pred for r in T.lang_id(df).collect()}
    assert rows[1] == "en" and rows[2] == "de" and rows[3] == "und"


def test_fingerprint_order_sensitive(spark):
    df = spark.createDataFrame(
        [(1, "a b c"), (2, "c b a"), (3, "A, b; c"), (4, "a b c")],
        "doc_id long, text string",
    )
    fp = {r.doc_id: r.fingerprint for r in T.fingerprint(df).collect()}
    assert fp[1] == fp[3] == fp[4]  # normalization-invariant
    assert fp[1] != fp[2]  # order-sensitive


# --- multimodal --------------------------------------------------------------

def test_multimodal_plumbing(docs):
    media = M.attach_fake_media(docs)
    assert media.schema.simpleString() == (
        "struct<doc_id:bigint,media_type:string,payload:binary,"
        "width:int,height:int,n_frames:int>"
    )
    feats = M.fake_features(media)
    rows = feats.limit(5).collect()
    assert all(len(r.features) == M.FEATURE_DIM for r in rows)
    # histogram normalized
    assert all(abs(sum(r.features) - 1.0) < 1e-3 for r in rows if r.n_bytes > 0)


def test_multimodal_decode_stub_raises():
    with pytest.raises(NotImplementedError, match="no codec"):
        M.decode_stub("image")


def test_frame_sample(docs):
    media = M.attach_fake_media(docs)
    fs = M.frame_sample(media, every=5)
    rows = fs.groupBy("doc_id").agg(F.max("frame_idx").alias("mx"),
                                    F.count("*").alias("n")).collect()
    vids = {r.doc_id: r.n_frames for r in
            media.filter("media_type = 'video'").collect()}
    assert {r.doc_id for r in rows} == set(vids)
    for r in rows:
        assert r.n == (vids[r.doc_id] + 4) // 5
        assert r.mx < vids[r.doc_id]


def test_fake_features_deterministic(docs):
    a = sorted(tuple(r.features) for r in
               M.fake_features(M.attach_fake_media(docs)).collect())
    b = sorted(tuple(r.features) for r in
               M.fake_features(M.attach_fake_media(docs)).collect())
    assert a == b
