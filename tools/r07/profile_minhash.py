"""r07 profiling: break pipeline_dedup_minhash into sub-stages (noop-sink
isolation, guide §1.4) at the driver's sf1.0 scale."""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from sparkbm25.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")


def t(label, fn):
    t0 = time.time()
    out = fn()
    dt = time.time() - t0
    print(f"{label:45s} {dt:8.3f}s  {out if out is not None else ''}", flush=True)
    return dt


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    spark = get_spark("r07-prof-minhash", cores=32, shuffle_partitions=32)
    sc = spark.sparkContext

    from sparkbm25.pipeline.dedup import (
        _shingle_hashes, minhash_bands, minhash_bands_from_xs,
        minhash_lsh_pairs, minhash_signature_from_xs, shingles_col,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id", "text")
    t("warm scan (count)", lambda: docs.count())

    # full op, twice (cold-ish then warm)
    sc.setJobDescription("minhash full #1")
    t("minhash_lsh_pairs b=32 (count) #1",
      lambda: minhash_lsh_pairs(docs, 0.5, n_bands=32).count())
    sc.setJobDescription("minhash full #2")
    t("minhash_lsh_pairs b=32 (count) #2",
      lambda: minhash_lsh_pairs(docs, 0.5, n_bands=32).count())

    # sub-stages
    sc.setJobDescription("shingle hash pass")
    t("  _shingle_hashes noop", lambda: noop(_shingle_hashes(docs, "text")))
    sc.setJobDescription("signature")
    t("  signatures noop",
      lambda: noop(minhash_signature_from_xs(_shingle_hashes(docs, "text"), 32)))
    sc.setJobDescription("bands")
    t("  bands noop", lambda: noop(minhash_bands(docs, "text", 32)))

    bands = minhash_bands(docs, "text", 32)
    t0 = time.time()
    bands = bands.localCheckpoint(eager=True)
    print(f"{'  bands localCheckpoint':45s} {time.time()-t0:8.3f}s", flush=True)

    a, b_ = bands.alias("a"), bands.alias("b")
    raw_pairs = a.join(
        b_,
        (F.col("a.band_id") == F.col("b.band_id"))
        & (F.col("a.key") == F.col("b.key"))
        & (F.col("a.doc_id") < F.col("b.doc_id")),
    ).select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
    sc.setJobDescription("selfjoin")
    n_raw = raw_pairs.count()
    t("  raw candidate pairs (count)", lambda: raw_pairs.count())
    print(f"    n_raw_candidates = {n_raw}")
    cand = raw_pairs.distinct()
    t("  distinct candidates (count)", lambda: cand.count())
    t0 = time.time()
    cand = cand.localCheckpoint(eager=True)
    print(f"{'  cand localCheckpoint':45s} {time.time()-t0:8.3f}s", flush=True)
    n_cand = cand.count()
    print(f"    n_cand = {n_cand}")

    cand_docs = (
        cand.select(F.col("doc_a").alias("doc_id"))
        .union(cand.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    sh = (
        docs.join(F.broadcast(cand_docs), "doc_id", "left_semi")
        .select("doc_id", shingles_col("text").alias("sh"))
    )
    verified = (
        cand.join(sh.withColumnRenamed("doc_id", "doc_a")
                  .withColumnRenamed("sh", "sh_a"), "doc_a")
        .join(sh.withColumnRenamed("doc_id", "doc_b")
              .withColumnRenamed("sh", "sh_b"), "doc_b")
        .withColumn("common", F.size(F.array_intersect("sh_a", "sh_b")))
        .withColumn("raw_j", F.col("common").cast("double")
                    / (F.size("sh_a") + F.size("sh_b") - F.col("common")))
        .filter(F.col("raw_j") >= 0.5)
    )
    sc.setJobDescription("verify")
    t("  verification (count)", lambda: verified.count())

    # how big is the input, really
    stats = docs.select(
        F.count("*").alias("n"),
        F.avg(F.length("text")).alias("avg_chars"),
        F.avg(F.size(shingles_col("text"))).alias("avg_shingles"),
    ).collect()[0]
    print("docs:", stats)
    spark.stop()


if __name__ == "__main__":
    main()
