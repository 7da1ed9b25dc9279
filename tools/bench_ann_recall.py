"""ANN recall/throughput frontier at scale (VERDICT r3 next-step #6).

Measures recall@10 of ``ivf_topk`` against ``cosine_topk`` ground truth
over a 250k-vector hash-derived corpus (dim 64), sweeping the two knobs
the operator documents as the recall/throughput trade
(operators/similarity.py:146-170): n_tables (independent hyperplane
tables) and n_probes (Hamming-1 multi-probe). Ground truth is computed
once (brute force, broadcast queries); each config reports recall,
wall seconds (best-of-N), and candidate-set speedup vs brute force.

Synthesis is JVM-side and deterministic (xxhash64-derived components,
same family as tools/bench_pipeline_scale.synth_vectors) with 5% of
vectors planted as near-dups of a base vector so the corpus has real
neighborhood structure, not just noise.

Usage: python tools/bench_ann_recall.py [n_vectors] [n_queries] [cpus]
  defaults: 250000 32 32 — prints one JSON line.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402

from hugegraph_computer_spark.operators.similarity import (  # noqa: E402
    cosine_topk,
    ivf_topk,
)
from hugegraph_computer_spark.session import get_spark  # noqa: E402

DIM = 64
K = 10


def synth_vectors(spark, n: int):
    """n deterministic vectors; ids i with i%20==19 reuse the seed of
    i-1 plus small hash jitter — planted near neighbors."""
    base = spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.when(F.col("id") % 20 == 19, F.col("id") - 1)
        .otherwise(F.col("id"))
        .alias("seed"),
    )
    vec = F.transform(
        F.sequence(F.lit(0), F.lit(DIM - 1)),
        lambda j: (
            (F.pmod(F.xxhash64(F.col("seed") * DIM + j), F.lit(2000)) - 1000.0)
            / 1000.0
            + (
                F.pmod(F.xxhash64(F.col("vec_id") * DIM + j, F.lit("jit")),
                       F.lit(100))
                - 50.0
            )
            / 2500.0
        ).cast("float"),
    )
    return base.select("vec_id", vec.alias("embedding"))


def main(n: int, n_queries: int, cpus: int, trials: int = 2) -> None:
    spark = get_spark(master=f"local[{cpus}]", app_name="ann-recall",
                      shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    emb = synth_vectors(spark, n).localCheckpoint(eager=True)
    queries = emb.where(F.col("vec_id") % (n // n_queries) == 7).limit(n_queries)
    queries = queries.localCheckpoint(eager=True)

    t0 = time.time()
    truth = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk(emb, queries, k=K).collect()
    }
    brute_sec = round(time.time() - t0, 2)

    out = {
        "n_vectors": n, "n_queries": n_queries, "dim": DIM, "k": K,
        "brute_force_sec": brute_sec, "configs": [],
    }
    for n_tables in (1, 2, 4, 8):
        for n_probes in (1, 4):
            best, got = None, None
            for _ in range(trials):
                t0 = time.time()
                got = {
                    (r["query_id"], r["neighbor_id"])
                    for r in ivf_topk(
                        emb, queries, k=K, n_planes=8,
                        n_tables=n_tables, n_probes=n_probes, dim=DIM,
                    ).collect()
                }
                sec = time.time() - t0
                best = sec if best is None or sec < best else best
            recall = len(got & truth) / len(truth)
            cfg = {
                "n_tables": n_tables, "n_probes": n_probes,
                "recall_at_10": round(recall, 4),
                "sec": round(best, 2),
                "speedup_vs_brute": round(brute_sec / best, 2),
            }
            out["configs"].append(cfg)
            print(f"# tables={n_tables} probes={n_probes} "
                  f"recall={recall:.3f} sec={best:.2f}", file=sys.stderr)
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 250_000
    q = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    cpus = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    main(n, q, cpus)
