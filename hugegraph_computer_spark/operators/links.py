"""Links — filtered path traversal (Links.java:30-130).

Reference semantics: paths start at vertices passing the start condition;
each superstep a path at vertex v is extended along every edge passing the
spread condition; a path is *recorded* (at the vertex where it ends) when
it reaches a vertex passing the end-vertex condition or an edge passing the
end-edge condition; un-ended paths keep flooding until no messages flow or
``bsp.max_super_step`` (10). The reference configures the three conditions
with a JSON DSL over property values (links/filter/LinksSpreadFilter.java);
our engine-idiomatic equivalent is three Spark SQL boolean expressions:

* ``start_cond``  — over vertex column ``vid``
* ``spread_cond`` / ``end_edge_cond`` — over edge columns
  (``src``, ``dst`` and any property columns of the edge DataFrame)
* ``end_vertex_cond`` — over ``vid``

Paths are vertex-id sequences (the reference also records edge-id chains;
our edge identity is the (src,dst) pair, recoverable from consecutive
path vertices). No cycle check — exactly like the reference, the superstep
cap bounds the flood.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation, functions as F

from hugegraph_computer_spark.graph.bsp import SuperstepLoop, release_local_checkpoint
from hugegraph_computer_spark.graph.graph import Graph


def links(
    graph: Graph,
    start_cond: str,
    spread_cond: str = "true",
    end_vertex_cond: str = "false",
    end_edge_cond: str = "false",
    max_supersteps: int = 10,
    checkpoint_dir: str | None = None,
    resume: bool = False,
    job_name: str = "links",
) -> DataFrame:
    """Run Links; returns ``(vid long, path array<long>)`` — one row per
    recorded path, anchored at the vertex that recorded it (the end vertex,
    or the source vertex of an end edge — Links.isEndEdgeAndSaveValue).

    ``checkpoint_dir``/``resume`` make the flood RESUMABLE exactly like
    rings_detection (north rule; reference TODO at MasterService.java:213):
    in-flight paths snapshot under ``{dir}/{job}_paths``, per-superstep
    recorded-path deltas under ``{dir}/{job}_out``; a delta is written
    before its superstep's path commit, so a kill replays at most one
    superstep (idempotent overwrite)."""
    spark = graph.edges.sparkSession
    loop_paths = SuperstepLoop(spark, f"{job_name}_paths", checkpoint_dir, max_supersteps)
    loop_out = SuperstepLoop(spark, f"{job_name}_out", checkpoint_dir, max_supersteps)
    edges = graph.edges

    deltas: list[DataFrame] = []
    local_deltas: list[DataFrame] = []
    start_s = 1
    state = loop_paths.resume() if resume else None

    def record(s: int, delta: DataFrame) -> None:
        if checkpoint_dir is not None:
            deltas.append(loop_out.save(s, delta, {}))
        else:
            d = delta.localCheckpoint(eager=True)
            local_deltas.append(d)
            deltas.append(d)

    if state is not None:
        s0, paths, _ = state
        start_s = s0 + 1
        for k in loop_out.completed_steps():
            if k <= s0:
                deltas.append(loop_out.read_step(k))
    else:
        # Links.compute0 early-returns when vertex.edges().size()==0 BEFORE
        # the end-vertex check (Links.java compute0), so an isolated start
        # vertex never records [self]; the semi-join against edge sources
        # replicates that (matters only when an explicit vertices DF adds
        # isolated ids).
        start = (
            graph.vertices()
            .join(edges.select(F.col("src").alias("vid")), "vid", "left_semi")
            .where(F.expr(start_cond))
            .select("vid", F.array("vid").alias("path"))
        )
        # a start vertex that is itself an end vertex records [self] and
        # stops (compute0 -> isEndVertexAndSaveValue short-circuit)
        record(0, start.where(F.expr(end_vertex_cond)).select("vid", "path"))
        live = start.where(~F.expr(end_vertex_cond))
        paths = loop_paths.materialize(0, live)
        loop_paths.commit(0, {})

    for s in range(start_s, max_supersteps):
        stepped = paths.join(edges, paths["vid"] == edges["src"]).select(
            edges["src"], edges["dst"],
            *[edges[c] for c in edges.columns if c not in ("src", "dst")],
            paths["path"],
        )
        # end-edge: record path + target at the CURRENT vertex
        edge_ended = (
            stepped.where(F.expr(end_edge_cond))
            .select(
                F.col("src").alias("vid"),
                F.concat("path", F.array(F.col("dst"))).alias("path"),
            )
        )
        moved = (
            stepped.where(~F.expr(end_edge_cond) & F.expr(spread_cond))
            .select(
                F.col("dst").alias("vid"),
                F.concat("path", F.array(F.col("dst"))).alias("path"),
            )
        )
        # end-vertex: record at the arriving vertex; others stay live
        vertex_ended = moved.where(F.expr(end_vertex_cond))
        live = moved.where(~F.expr(end_vertex_cond))
        record(s, edge_ended.unionByName(vertex_ended))
        obs = Observation(f"{job_name}_s{s}")
        paths = loop_paths.materialize(
            s, live.observe(obs, F.count(F.lit(1)).alias("n"))
        )
        n = int(obs.get["n"] or 0)
        if n == 0:
            loop_paths.discard_step(s)  # keep s-1 as the resume point
            break
        loop_paths.commit(s, {"in_flight": n})

    results = spark.createDataFrame([], "vid long, path array<long>")
    for d in deltas:
        results = results.unionByName(d)
    out = results.localCheckpoint(eager=True)
    for d in local_deltas:
        release_local_checkpoint(d)
    loop_paths.cleanup(keep_last=False)
    loop_out.cleanup(keep_last=False)
    return out
