"""Synthesize a deterministic 10x scale dir (sf1) from sf0.1.

The driver ships sf{0.001,0.01,0.1}; VERDICT r3 next-step #1 asks for the
headline bench at 10x that, so betweenness/closeness/rings stop being
job-overhead-bound and the >=~linear scaling claim is measured, not
argued. TPC-H-style scaling semantics (all derivation is JVM-side and
seedless-deterministic — xxhash64 of key columns):

* ``orders``   — 10 shifted copies: o_orderkey/o_custkey move into copy-k
  key ranges (customer population x10, order count x10).
* ``lineitem`` — 10 shifted copies; ``l_suppkey`` and ``l_partkey`` are
  REASSIGNED uniformly over the 10x supplier/part pools via xxhash64 of
  the (new) order key + line number, mirroring TPC-H's uniform draw at
  any scale factor. This BRIDGES the copies: the customer-supplier graph
  becomes one 10x connected family (suppliers shared across copies), not
  10 disjoint clones — per-supplier degree stays ~constant while vertex
  and edge counts grow 10x, which is exactly how a bigger TPC-H behaves.
* ``customer/supplier/part`` — 10 shifted copies (key ranges only).
* ``nation/region`` — copied as-is (the nation clique is 25 vertices at
  EVERY scale factor by design; rings_count is a fixed-size query).
* ``documents`` — 10 copies; copy k>0 rewrites ~60% of words through a
  per-(word, k) deterministic substitution, one "dialect" per copy: the
  within-copy near-dup structure is preserved exactly (same words map to
  same replacements) while cross-copy Jaccard drops to ~0.25 < the 0.3
  gate threshold, so dedup workloads grow ~10x in rows, not 45x in pairs.
* ``embeddings`` — 10 copies; copy k sign-flips components by
  xxhash64(vec_id', j) so copies decorrelate while norms are preserved.
* ``events`` — 10 copies with shifted event/user ids (user space x10).

Usage: python tools/make_sf1.py [out_dir] [factor]
  defaults: /root/repo/.bench/sf1 10
"""

from __future__ import annotations

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from hugegraph_computer_spark.session import get_spark  # noqa: E402

SRC = "/root/testdata/sf0.1"


def _span(df: DataFrame, col: str) -> int:
    hi = df.agg(F.max(col)).collect()[0][0]
    return int(hi) + 1


def copies(df: DataFrame, k: int) -> DataFrame:
    return df.crossJoin(
        df.sparkSession.range(k).select(F.col("id").cast("long").alias("copy"))
    )


def main(out: str, factor: int) -> None:
    spark = get_spark(master="local[16]", app_name="make-sf1",
                      shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    rd = lambda t: spark.read.parquet(f"{SRC}/{t}.parquet")  # noqa: E731
    wr = lambda df, t: df.write.mode("overwrite").parquet(f"{out}/{t}.parquet")  # noqa: E731

    orders, lineitem = rd("orders"), rd("lineitem")
    ord_span = _span(orders, "o_orderkey")
    cust_span = _span(orders, "o_custkey")
    supp_span = _span(lineitem, "l_suppkey")
    part_span = _span(lineitem, "l_partkey")

    wr(
        copies(orders, factor).select(
            (F.col("o_orderkey") + F.col("copy") * ord_span).alias("o_orderkey"),
            (F.col("o_custkey") + F.col("copy") * cust_span).alias("o_custkey"),
            *[c for c in orders.columns if c not in ("o_orderkey", "o_custkey")],
        ),
        "orders",
    )
    li = copies(lineitem, factor).withColumn(
        "l_orderkey", F.col("l_orderkey") + F.col("copy") * ord_span
    )
    wr(
        li.select(
            "l_orderkey",
            # uniform draw over the 10x pools, keyed by the scaled order
            # key + line number (TPC-H assigns suppliers/parts uniformly
            # at any SF — this is what bridges the copies)
            (1 + F.pmod(
                F.xxhash64(F.col("l_orderkey"), F.col("l_linenumber"), F.lit("supp")),
                F.lit(factor * supp_span),
            )).alias("l_suppkey"),
            (1 + F.pmod(
                F.xxhash64(F.col("l_orderkey"), F.col("l_linenumber"), F.lit("part")),
                F.lit(factor * part_span),
            )).alias("l_partkey"),
            *[c for c in lineitem.columns
              if c not in ("l_orderkey", "l_suppkey", "l_partkey")],
        ),
        "lineitem",
    )

    for t, key in (("customer", "c_custkey"), ("supplier", "s_suppkey"),
                   ("part", "p_partkey")):
        df = rd(t)
        span = _span(df, key)
        wr(
            copies(df, factor).select(
                (F.col(key) + F.col("copy") * span).alias(key),
                *[c for c in df.columns if c != key],
            ),
            t,
        )
    for t in ("nation", "region"):
        wr(rd(t), t)

    docs = rd("documents")
    doc_span = _span(docs, "doc_id")
    mutated = F.concat_ws(
        " ",
        F.transform(
            F.split(F.col("text"), " "),
            lambda w: F.when(
                (F.col("copy") == 0)
                | (F.pmod(F.xxhash64(w, F.col("copy")), F.lit(10)) >= 6),
                w,
            ).otherwise(
                F.concat(F.lit("c"), F.col("copy").cast("string"), F.lit("_"),
                         F.pmod(F.xxhash64(w, F.col("copy")), F.lit(99991))
                         .cast("string"))
            ),
        ),
    )
    wr(
        copies(docs, factor).select(
            (F.col("doc_id") + F.col("copy") * doc_span).alias("doc_id"),
            mutated.alias("text"),
            "lang", "source",
            F.length(mutated).alias("n_chars"),
        ),
        "documents",
    )

    emb = rd("embeddings")
    vec_span = _span(emb, "vec_id")
    new_id = (F.col("vec_id") + F.col("copy") * vec_span).alias("vec_id")
    flipped = F.transform(
        "embedding",
        lambda x, j: F.when(
            (F.col("copy") == 0)
            | (F.pmod(F.xxhash64(F.col("vec_id"), j, F.col("copy")), F.lit(2)) == 0),
            x,
        ).otherwise(-x),
    )
    wr(copies(emb, factor).select(new_id, flipped.alias("embedding"), "label"),
       "embeddings")

    ev = rd("events")
    ev_span = _span(ev, "event_id")
    user_span = _span(ev, "user_id")
    wr(
        copies(ev, factor).select(
            (F.col("event_id") + F.col("copy") * ev_span).alias("event_id"),
            "ts",
            (F.col("user_id") + F.col("copy") * user_span).alias("user_id"),
            "event_type", "value", "props",
        ),
        "events",
    )
    for t in ("orders", "lineitem", "documents", "embeddings", "events"):
        n = spark.read.parquet(f"{out}/{t}.parquet").count()
        print(f"{t}: {n} rows")
    spark.stop()


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else str(REPO / ".bench" / "sf1")
    factor = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    main(out, factor)
