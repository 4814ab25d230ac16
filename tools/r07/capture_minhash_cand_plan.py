"""Capture the minhash CANDIDATE-GENERATION plan (the part that the eager
localCheckpoint hides from the final verification plan).

Usage: python capture_minhash_cand_plan.py <repo_root> <out_file>"""
import sys

repo, out = sys.argv[1], sys.argv[2]
sys.path.insert(0, repo)

from pyspark.sql import functions as F  # noqa: E402

from sparkbm25.session import get_spark  # noqa: E402

spark = get_spark("r07-mh-plan", cores=8, shuffle_partitions=8)
import sparkbm25.pipeline.dedup as D  # noqa: E402

docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet").select(
    "doc_id", "text"
)
if hasattr(D, "_band_keys_from_xs"):  # r07 shape
    bands = D._band_keys_from_xs(D._ngram_hashes(docs, "text"), 32)
    buckets = bands.groupBy("band_id", "h0", "h1").agg(
        F.collect_list("doc_id").alias("ds")
    ).filter(F.size("ds") >= 2)
    pair_expr = F.explode(
        F.flatten(
            F.transform(
                F.col("ds"),
                lambda x, i: F.transform(
                    F.slice(F.col("ds"), i + 2, F.size("ds")),
                    lambda y: F.struct(
                        F.least(x, y).alias("a"),
                        F.greatest(x, y).alias("b"),
                    ),
                ),
            )
        )
    )
    cand = buckets.select(pair_expr.alias("p")).select(
        F.col("p.a").alias("doc_a"), F.col("p.b").alias("doc_b")
    ).distinct()
else:  # round-start shape
    bands = D.minhash_bands(docs, "text", 32)
    a, b_ = bands.alias("a"), bands.alias("b")
    cand = a.join(
        b_,
        (F.col("a.band_id") == F.col("b.band_id"))
        & (F.col("a.key") == F.col("b.key"))
        & (F.col("a.doc_id") < F.col("b.doc_id")),
    ).select(
        F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
    ).distinct()

mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
    "formatted"
)
with open(out, "w") as fh:
    fh.write(cand._jdf.queryExecution().explainString(mode))
print("written", out)
spark.stop()
