"""Adversarial-skew stress for the window-heavy LLM ops (VERDICT r3
next-round item 6): epoch_shuffle, select_within_budget, and
knn_classify each get a worst-case-skew corpus next to a uniform
control at the same row count, so SCALE.md can state a measured
skew-to-uniform wall ratio instead of a plan-reading claim.

Skew shapes (each the op's hottest partition key):

- epoch_shuffle: duplicate keys collide to ONE md5 -> one hash-prefix
  bucket holds the hot mass -> the intra-bucket row_number window
  serializes there. Stress: 90% of rows share one key.
- select_within_budget: the bucket IS the score -> one dominant score
  value funnels 90% of the corpus through one window partition.
  Control: near-unique integer scores + coarse_div quantization.
- knn_classify: per-query work is bounded by construction (broadcast
  query side x corpus scan; window partitioned by query_id), so the
  stress is a degenerate corpus (99% identical vectors, one hot
  label) — the measurement documents that the plan is insensitive.

Usage: python scripts/stress_llm_skew.py [n_rows]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F  # noqa: E402


def timed(fn) -> float:
    t0 = time.perf_counter()
    fn()
    return round(time.perf_counter() - t0, 3)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    from diseasystore_spark.pipeline.sample import (
        epoch_shuffle,
        select_within_budget,
    )
    from diseasystore_spark.pipeline.similarity import knn_classify
    from diseasystore_spark.session import get_spark

    spark = get_spark("stress_llm_skew")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # warm
    out: dict[str, dict[str, float]] = {}

    # ---------------------------------------------------- epoch_shuffle
    uniform = spark.range(n).select(
        F.concat(F.lit("doc_"), F.col("id")).alias("doc_id")
    )
    skewed = spark.range(n).select(
        F.when(F.col("id") % 10 < 9, F.lit("hot_key"))
        .otherwise(F.concat(F.lit("doc_"), F.col("id")))
        .alias("doc_id")
    )
    out["epoch_shuffle"] = {
        "uniform": timed(
            lambda: epoch_shuffle(uniform, seed="e1")
            .agg(F.sum("rank")).collect()
        ),
        "skewed_90pct_one_key": timed(
            lambda: epoch_shuffle(skewed, seed="e1")
            .agg(F.sum("rank")).collect()
        ),
    }

    # ---------------------------------------------- select_within_budget
    docs_uni = spark.range(n).select(
        F.col("id").alias("doc_id"),
        (F.col("id") * 37 % 1_000_000).alias("score"),
        (F.col("id") % 700 + 100).alias("n_tokens"),
    )
    docs_skew = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 10 < 9, F.lit(500_000))
        .otherwise(F.col("id") * 37 % 1_000_000)
        .alias("score"),
        (F.col("id") % 700 + 100).alias("n_tokens"),
    )
    budget = n * 200
    out["select_within_budget"] = {
        "uniform_coarse_div": timed(
            lambda: select_within_budget(
                docs_uni, "score", "n_tokens", budget, coarse_div=1_000
            ).agg(F.sum("cum_size")).collect()
        ),
        "skewed_90pct_one_score": timed(
            lambda: select_within_budget(
                docs_skew, "score", "n_tokens", budget, coarse_div=1_000
            ).agg(F.sum("cum_size")).collect()
        ),
    }

    # --------------------------------------------------- knn_classify
    dim, nq, nc = 32, 200, n // 20
    vec_uni = F.array(
        *[(F.hash(F.col("id") * (i + 1)) % 1000 / 1000.0).cast("float")
          for i in range(dim)]
    )
    corpus_uni = spark.range(nc).select(
        F.col("id").alias("vec_id"), vec_uni.alias("embedding"),
        (F.col("id") % 5).cast("string").alias("label"),
    )
    hot_vec = F.array(*[F.lit(float(i % 7) / 7.0).cast("float")
                        for i in range(dim)])
    corpus_skew = spark.range(nc).select(
        F.col("id").alias("vec_id"),
        F.when(F.col("id") % 100 < 99, hot_vec).otherwise(vec_uni)
        .alias("embedding"),
        F.when(F.col("id") % 100 < 99, F.lit("hot"))
        .otherwise((F.col("id") % 5).cast("string")).alias("label"),
    )
    queries = spark.range(nq).select(
        (F.col("id") + 10_000_000).alias("vec_id"), vec_uni.alias("embedding"),
    )
    out["knn_classify"] = {
        "uniform": timed(
            lambda: knn_classify(corpus_uni, queries).count()
        ),
        "skewed_99pct_one_cluster": timed(
            lambda: knn_classify(corpus_skew, queries).count()
        ),
    }

    print(json.dumps({"n_rows": n, "results": out}))


if __name__ == "__main__":
    main()
