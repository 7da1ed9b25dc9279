"""Data-volume scaling evidence for the pipeline ops (VERDICT r2 #9).

The dedup/ANN/text operators are gate-checked at 50k docs; this tool
measures the SAME operators at two data volumes (default 50k and 500k
synthetic docs / 20k and 200k vectors) and reports rows/sec at both plus
the throughput ratio — near-1.0 means the op scales linearly in rows, the
LSH design goal (banded bucket joins, no all-pairs term). Also measures
the bucket-cap effect: embedding near-dup with a planted fat cluster,
capped vs uncapped.

Synthesis is deterministic and entirely JVM-side (hash-derived words /
vector components; no Python in the generate path), so both volumes are
reproducible and generation does not pollute the timings (inputs are
localCheckpointed before the clock starts).

Usage:
  python tools/bench_pipeline_scale.py [small_docs] [factor] [cpus]
  # defaults: 50000 10 32 — prints one JSON line
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402

from hugegraph_computer_spark.graph.bsp import release_local_checkpoint  # noqa: E402
from hugegraph_computer_spark.operators.dedup import (  # noqa: E402
    dedup_clusters,
    minhash_lsh_pairs,
)
from hugegraph_computer_spark.operators.similarity import (  # noqa: E402
    embedding_near_dup_pairs,
    ivf_topk,
)
from hugegraph_computer_spark.session import get_spark  # noqa: E402

VOCAB = 2000
DOC_WORDS = 30
DIM = 64


def synth_docs(spark, n: int):
    """n docs, ~30 hash-derived words each; every 20th doc is a near-dup
    of its predecessor (same content seed => near-identical shingles)."""
    base = spark.range(n).select(
        F.col("id").alias("doc_id"),
        # near-dup planting: docs 19,39,... share the predecessor's seed
        F.when(F.col("id") % 20 == 19, F.col("id") - 1)
        .otherwise(F.col("id"))
        .alias("seed"),
    )
    words = F.transform(
        F.sequence(F.lit(0), F.lit(DOC_WORDS - 1)),
        lambda j: F.concat(
            F.lit("w"),
            F.pmod(F.xxhash64(F.col("seed") * DOC_WORDS + j), F.lit(VOCAB)).cast("string"),
        ),
    )
    return base.select("doc_id", F.concat_ws(" ", words).alias("text"))


def synth_vectors(spark, n: int, cluster: int = 0):
    """n hash-derived unit-ish vectors; optionally the LAST ``cluster``
    ids share one vector (the degenerate near-identical cluster that
    makes uncapped LSH buckets quadratic)."""
    base = spark.range(n).select(F.col("id").alias("vec_id"))
    seed = (
        F.when(F.col("vec_id") >= n - cluster, F.lit(n - cluster))
        .otherwise(F.col("vec_id"))
        if cluster
        else F.col("vec_id")
    )
    vec = F.transform(
        F.sequence(F.lit(0), F.lit(DIM - 1)),
        lambda j: (
            (F.pmod(F.xxhash64(seed * DIM + j), F.lit(2001)) - 1000) / 1000.0
        ).cast("float"),
    )
    return base.select("vec_id", vec.alias("embedding"))


def timed(fn) -> float:
    t0 = time.time()
    fn()
    return time.time() - t0


def consume(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def measure(spark, n_docs: int, n_vecs: int) -> dict:
    docs = synth_docs(spark, n_docs).localCheckpoint(eager=True)
    vecs = synth_vectors(spark, n_vecs).localCheckpoint(eager=True)
    q = vecs.where(F.col("vec_id") < 8)
    out = {
        "n_docs": n_docs,
        "n_vecs": n_vecs,
        "minhash_lsh_pairs_sec": round(
            timed(lambda: consume(minhash_lsh_pairs(docs, max_bucket=200))), 3
        ),
        "dedup_clusters_sec": round(
            timed(lambda: consume(dedup_clusters(docs, threshold=0.5, max_bucket=200))), 3
        ),
        "ivf_topk_sec": round(
            timed(lambda: consume(ivf_topk(
                vecs, q, k=10, n_planes=8, n_tables=4, dim=DIM, max_bucket=4096
            ))), 3
        ),
    }
    release_local_checkpoint(docs)
    release_local_checkpoint(vecs)
    return out


def bucket_cap_effect(spark, n_vecs: int, cluster: int) -> dict:
    vecs = synth_vectors(spark, n_vecs, cluster=cluster).localCheckpoint(eager=True)
    capped = timed(lambda: consume(embedding_near_dup_pairs(
        vecs, threshold=0.95, n_planes=8, n_tables=4, dim=DIM, max_bucket=256
    )))
    uncapped = timed(lambda: consume(embedding_near_dup_pairs(
        vecs, threshold=0.95, n_planes=8, n_tables=4, dim=DIM
    )))
    release_local_checkpoint(vecs)
    return {
        "n_vecs": n_vecs,
        "planted_cluster": cluster,
        "capped_sec": round(capped, 3),
        "uncapped_sec": round(uncapped, 3),
    }


def main() -> None:
    small = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    factor = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    cpus = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    spark = get_spark(
        master=f"local[{cpus}]", app_name="hgc-pipeline-scale",
        shuffle_partitions=cpus,
    )
    spark.sparkContext.setLogLevel("ERROR")
    lo = measure(spark, small, small // 2)
    hi = measure(spark, small * factor, small // 2 * factor)
    ratios = {}
    for k in ("minhash_lsh_pairs", "dedup_clusters", "ivf_topk"):
        rows = "n_docs" if k != "ivf_topk" else "n_vecs"
        tp_lo = lo[rows] / lo[f"{k}_sec"]
        tp_hi = hi[rows] / hi[f"{k}_sec"]
        ratios[k] = {
            "rows_per_sec_lo": round(tp_lo),
            "rows_per_sec_hi": round(tp_hi),
            "throughput_ratio_hi_over_lo": round(tp_hi / tp_lo, 3),
        }
    cap = bucket_cap_effect(spark, small, cluster=2000)
    spark.stop()
    print(json.dumps({
        "factor": factor, "cpus": cpus,
        "lo": lo, "hi": hi, "scaling": ratios, "bucket_cap": cap,
    }))


if __name__ == "__main__":
    main()
