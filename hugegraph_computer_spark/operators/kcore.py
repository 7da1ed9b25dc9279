"""Coreness (k-core decomposition) — h-index fixpoint iteration.

An engine extension beyond the reference's algorithm set (the training-data
pipeline uses coreness to filter weakly-connected boilerplate/hub regions
of a link graph before sampling).

Algorithm (Lü-Chen-Ren-Zhang-Zhang-Zhou 2016): initialize h(v) = deg(v);
iterate h(v) <- H({h(u) : u in N(v)}) where H is the h-index (the largest
i such that at least i neighbors have value >= i). The fixpoint equals the
exact coreness for every vertex. The update is monotone non-increasing, so
delta/frontier messaging applies: only vertices with a changed neighbor
recompute — same vote-to-halt shape as WCC.

The H-index of a neighbor multiset is computed JVM-side:
sort desc, count positions where value >= rank — no Python in the loop.
"""

from __future__ import annotations

import time

from pyspark.sql import Column, DataFrame, Observation, functions as F

from hugegraph_computer_spark.graph.bsp import SuperstepLoop
from hugegraph_computer_spark.graph.graph import Graph


def _hindex(values: Column) -> Column:
    """H-index of an array<long> column."""
    s = F.reverse(F.sort_array(values))
    return F.size(
        F.filter(
            F.arrays_zip(s.alias("v"), F.sequence(F.lit(1), F.size(s)).alias("r")),
            lambda x: x["v"] >= x["r"],
        )
    ).cast("long")


def coreness(
    graph: Graph,
    max_supersteps: int = 100,
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 1,
    job_name: str = "coreness",
    resume: bool = False,
) -> DataFrame:
    """Returns ``(vid long, coreness long)`` (0 for isolated vertices)."""
    spark = graph.edges.sparkSession
    loop = SuperstepLoop(
        spark, job_name, checkpoint_dir, max_supersteps, checkpoint_every,
        resume=resume,
    )
    # self-loops neither contribute to coreness nor to the peeling degree;
    # the filter sits over the cached src-partitioned frame (partitioning
    # and sort survive it), so each round's join re-shuffles nothing
    edges = graph.flat_edges(build_hash=True).where(F.col("src") != F.col("dst"))

    start = 1
    state = None
    if resume:
        resumed = loop.resume()
        if resumed is not None:
            s, state, aggs = resumed
            if aggs.get("changed", 1) == 0 or s >= max_supersteps - 1:
                return state.select("vid", F.col("h").alias("coreness"))
            start = s + 1

    if state is None:
        deg = edges.groupBy(F.col("src").alias("vid")).agg(
            F.count(F.lit(1)).cast("long").alias("deg")
        )
        state = (
            graph.vertices()
            .join(deg, "vid", "left")
            .select(
                "vid",
                F.coalesce("deg", F.lit(0)).cast("long").alias("h"),
                F.lit(True).alias("changed"),
            )
        )
        state = loop.save(0, state, {"changed": -1}, {"supersteps": 0})

    for s in range(start, max_supersteps):
        t0 = time.time()
        # vertices adjacent to a change must recompute their H-index over
        # ALL current neighbor values (not only the changed ones)
        affected = (
            state.where("changed")
            .join(edges, state["vid"] == edges["src"])
            .select(F.col("dst").alias("vid"))
            .dropDuplicates(["vid"])
        )
        nbr_h = (
            edges.join(affected, edges["dst"] == affected["vid"], "left_semi")
            .join(
                state.select(F.col("vid").alias("src"), F.col("h").alias("nh")),
                "src",
            )
            .groupBy(F.col("dst").alias("vid"))
            .agg(_hindex(F.collect_list("nh")).alias("cand"))
        )
        new_state = (
            state.join(nbr_h, "vid", "left")
            .select(
                "vid",
                F.least(
                    F.col("h"), F.coalesce(F.col("cand"), F.col("h"))
                ).alias("new_h"),
                F.col("h").alias("old_h"),
            )
            .select(
                "vid",
                F.col("new_h").alias("h"),
                (F.col("new_h") < F.col("old_h")).alias("changed"),
            )
        )
        obs = Observation(f"{job_name}_s{s}")
        observed = new_state.observe(
            obs, F.sum(F.col("changed").cast("long")).alias("c")
        )
        state = loop.materialize(s, observed)
        changed = int(obs.get["c"] or 0)
        loop.commit(s, {"changed": changed}, {"supersteps": s, "sec": time.time() - t0})
        if changed == 0:
            break

    loop.cleanup()
    return state.select("vid", F.col("h").alias("coreness"))
