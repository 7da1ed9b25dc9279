"""Physical-plan assertions + checkpoint/resume/determinism guarantees.

The plan tests are the "is this the plan I'd want at 100 TB" gate
(SURVEY.md §4): pushdown reaching parquet, no cartesian products, cached
adjacency advertising its partitioning so the per-superstep scatter join
does not re-shuffle the big static side.
"""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from hugegraph_computer_spark.graph.graph import Graph
from hugegraph_computer_spark.operators import lpa, pagerank, wcc
from hugegraph_computer_spark.plans.checks import (
    assert_no_cartesian,
    assert_pushed_filters,
    explain_str,
)
from tests.oracle import random_edges
from tests.test_algorithms import df_to_dict, make_graph


@pytest.fixture
def testdata_dir():
    d = "/root/testdata/sf0.001"
    if not os.path.isdir(d):
        pytest.skip("driver testdata not present")
    return d


def test_filter_pushdown_to_parquet(spark, testdata_dir):
    li = spark.read.parquet(f"{testdata_dir}/lineitem.parquet")
    q = li.where(F.col("l_suppkey") == 7).select("l_orderkey", "l_suppkey")
    assert_pushed_filters(q, "l_suppkey")
    # column pruning: scan must read only the 2 projected columns
    plan = explain_str(q)
    assert "l_extendedprice" not in plan.split("ReadSchema")[1][:200]


def test_scatter_join_no_cartesian_and_no_adj_exchange(spark):
    g = make_graph(spark, random_edges(100, 300, seed=1))
    adj = g.adjacency()
    adj.count()
    contrib = g.degrees().select("vid", (1.0 / F.greatest("deg", F.lit(1))).alias("c"))
    joined = adj.join(contrib, "vid")
    assert_no_cartesian(joined)
    # With broadcast allowed the small side is broadcast (shuffle-free);
    # force SMJ to assert the 100-TB-relevant property: the cached
    # adjacency (persisted hash-partitioned + sorted by vid) must need
    # neither an Exchange nor a Sort on its side of the join.
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        plan = explain_str(adj.join(contrib, "vid"))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    join_tail = plan.split("SortMergeJoin", 1)[-1]
    adj_branch = join_tail.split("InMemoryTableScan", 1)[0]
    assert "Exchange" not in adj_branch and "Sort" not in adj_branch, plan[:1800]


def test_corpus_scan_prunes_columns(spark, testdata_dir):
    docs = spark.read.parquet(f"{testdata_dir}/documents.parquet")
    q = docs.where(F.col("lang") == "en").select("doc_id")
    assert_pushed_filters(q, "lang")


@pytest.mark.parametrize("algo,kw,col", [
    (pagerank, {"l1_threshold": 1e-6, "max_supersteps": 10}, "rank"),
    (wcc, {}, "component"),
    (lpa, {}, "label"),
])
def test_resume_identical_after_partial_checkpoint(spark, tmp_path, algo, kw, col):
    g = make_graph(spark, random_edges(80, 240, seed=4))
    ck = str(tmp_path / algo.__name__)
    full = df_to_dict(algo(g, checkpoint_dir=ck, **kw), "vid", col)
    job = os.listdir(ck)[0]
    steps = sorted(os.listdir(os.path.join(ck, job)))
    assert len(steps) >= 2, "expected per-superstep snapshots"
    # simulate a crash: drop the last snapshot, resume mid-iteration
    shutil.rmtree(os.path.join(ck, job, steps[-1]))
    resumed = df_to_dict(algo(g, checkpoint_dir=ck, resume=True, **kw), "vid", col)
    assert resumed == full


def test_snapshot_meta_carries_lineage_and_aggregates(spark, tmp_path):
    import json

    g = make_graph(spark, random_edges(50, 150, seed=6))
    ck = str(tmp_path)
    pagerank(g, l1_threshold=1e-6, max_supersteps=4, checkpoint_dir=ck)
    job_dir = os.path.join(ck, "page_rank")
    metas = []
    for d in sorted(os.listdir(job_dir)):
        with open(os.path.join(job_dir, d, "_meta.json")) as f:
            metas.append(json.load(f))
    assert all("aggregates" in m and "metrics" in m for m in metas)
    late = [m for m in metas if m["superstep"] > 0]
    assert all("partition_rows" in m["metrics"] for m in metas)
    assert all("l1" in m["aggregates"] for m in late)


def test_checkpoint_every_n(spark, tmp_path):
    g = make_graph(spark, random_edges(50, 150, seed=8))
    ck = str(tmp_path)
    pagerank(g, l1_threshold=-1.0, max_supersteps=6, checkpoint_dir=ck,
             checkpoint_every=2)
    steps = sorted(os.listdir(os.path.join(ck, "page_rank")))
    assert steps == ["superstep=0", "superstep=2", "superstep=4"]


def test_cosine_topk_broadcasts_queries(spark):
    """The small query side must broadcast — at 10^9 corpus vectors the
    corpus side streams and only the query batch replicates."""
    from hugegraph_computer_spark.operators.similarity import cosine_topk
    from hugegraph_computer_spark.plans.checks import assert_broadcast_join

    emb = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(50)],
        "vec_id long, embedding array<float>",
    )
    q = cosine_topk(emb, emb.where(F.col("vec_id") < 2), k=3)
    assert_broadcast_join(q)


def test_pagerank_scatter_has_partial_aggregate(spark):
    """The message combine must partial-aggregate map-side (the reference's
    send-side combiner) — the plan needs two HashAggregates around the
    exchange, not a single post-shuffle aggregate."""
    g = make_graph(spark, random_edges(80, 240, seed=41))
    adj = g.adjacency()
    contrib = g.degrees().select("vid", (1.0 / F.greatest("deg", F.lit(1))).alias("contrib"))
    msgs = (
        adj.join(contrib, "vid")
        .select(F.explode("nbrs").alias("dst"), "contrib")
        .groupBy("dst")
        .agg(F.sum("contrib").alias("s"))
    )
    plan = explain_str(msgs)
    pre_exchange = plan.split("Exchange hashpartitioning(dst", 1)[0]
    assert "HashAggregate" in pre_exchange, plan[:2000]


def test_snapshot_format_seam(spark, tmp_path):
    """The durable snapshot writer is a format seam: an explicit
    snapshot_format routes write+read+resume through .format(fmt) (Iceberg
    on a cluster with the runtime jar; parquet here), and an unknown
    format fails AT the seam — proving nothing bypasses it."""
    from hugegraph_computer_spark.graph.bsp import SuperstepLoop

    loop = SuperstepLoop(
        spark, "seam", str(tmp_path), max_supersteps=3, snapshot_format="parquet"
    )
    df = spark.range(10).select(F.col("id").alias("vid"))
    loop.save(0, df, {"a": 1})
    s, state, aggs = loop.resume()
    assert s == 0 and state.count() == 10 and aggs == {"a": 1}

    bogus = SuperstepLoop(
        spark, "seam2", str(tmp_path), max_supersteps=3, snapshot_format="no-such-fmt"
    )
    with pytest.raises(Exception):
        bogus.save(0, df, {})


def test_level_flood_join_no_exchange_on_cached_flat_edges(spark):
    """The per-level frontier ⋈ edges join of the path-flood family
    (betweenness/closeness/rings/links/kcore) must need neither an
    Exchange nor a Sort on the cached flat_edges side — the static side
    is persisted hash-partitioned + sorted by src, so each level
    re-shuffles only the frontier. Also covers the all_cols variant:
    a filter + projection over it must preserve the property."""
    g = make_graph(spark, random_edges(100, 300, seed=2))
    fe = g.flat_edges()
    fe.count()
    frontier = g.vertices().limit(10).select(
        F.col("vid").alias("source"), F.col("vid"), F.lit(1.0).alias("sigma")
    )
    def static_branch_lines(plan: str) -> list[str]:
        """Lines of the SMJ's RIGHT (static) branch: walk upward from the
        InMemoryTableScan line, collecting ancestors until the join; the
        left branch's lines all carry the ':' tree marker, the right
        branch's do not."""
        lines = plan.splitlines()
        idx = next(i for i, l in enumerate(lines) if "InMemoryTableScan" in l)
        branch = []
        for l in reversed(lines[:idx]):
            if "SortMergeJoin" in l or "ShuffledHashJoin" in l:
                break
            if not l.strip().startswith(":"):
                branch.append(l)
        return branch

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = frontier.join(fe, frontier["vid"] == fe["src"])
        assert_no_cartesian(joined)
        plan = explain_str(joined, mode="simple")
        bad = [l for l in static_branch_lines(plan)
               if "Exchange" in l or "Sort" in l]
        assert not bad, (bad, plan[:1800])

        fe_all = g.flat_edges(all_cols=True)
        fe_all.count()
        filtered = fe_all.where(F.col("src") != F.col("dst")).select("src", "dst")
        plan2 = explain_str(
            frontier.join(filtered, frontier["vid"] == filtered["src"]),
            mode="simple",
        )
        bad2 = [l for l in static_branch_lines(plan2)
                if "Exchange" in l or "Sort" in l]
        assert not bad2, (bad2, plan2[:1800])

        # build_hash=True (the flood family's choice): the join must be a
        # ShuffledHashJoin building on the cached side — SHJ never sorts
        # either input at join time (SMJ would re-sort the k·V-row
        # frontier every level), so asserting the strategy IS the no-sort
        # assertion; the static branch additionally needs no Exchange.
        fe_hash = g.flat_edges(build_hash=True)
        plan3 = explain_str(
            frontier.join(fe_hash, frontier["vid"] == fe_hash["src"]),
            mode="simple",
        )
        assert "ShuffledHashJoin" in plan3, plan3[:1800]
        bad3 = [l for l in static_branch_lines(plan3) if "Exchange" in l]
        assert not bad3, (bad3, plan3[:1800])
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
