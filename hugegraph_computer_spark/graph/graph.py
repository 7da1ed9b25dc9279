"""The engine's graph representation: plain DataFrames, partitioned by vertex id.

Mirrors the reference's runtime data model (SURVEY.md §1) without porting it:

* the reference decomposes a property graph into an id-sorted vertex table
  and a packed out-adjacency table per hash partition
  (computer-core/.../compute/FileGraphPartition.java:96-122, 302-339);
  we keep ``edges(src long, dst long [, weight double])`` and a derived,
  cached ``adjacency`` DataFrame ``(vid, nbrs array<long>, deg long)``.
* the reference symmetrizes the graph at load by default — for every loaded
  edge u→v it also creates v→u with property inv=true
  (computer-core/.../input/WorkerInputManager.java:104-122), so all
  algorithms see undirected neighborhoods. ``Graph.from_edges`` replicates
  this with a union of the reversed edge table.
* duplicate edges are deduplicated per ``input.edge_freq`` (SINGLE keeps one
  edge per (src,dst); default MULTIPLE keeps all —
  computer-core/.../config/EdgeFrequency.java:26-44). ``dedup=True`` maps to
  SINGLE, which is what TriangleCount pins
  (TriangleCountParams.java:41-42).
* edges whose endpoints have no vertex record are dropped by the reference's
  input merge ("Skip stale edges", FileGraphPartition.java:314-317); we take
  the vertex set to be the endpoints of the edge table unless an explicit
  vertex DataFrame is supplied, in which case stale edges are inner-joined
  away exactly like the reference.
* super-node handling: the reference chunks a hub's adjacency into <=200-edge
  sub-entries so no single record must fit in memory
  (ComputerOptions.java:168-175). ``adjacency(chunk=...)`` does the same —
  a hub's neighbor array is split across several rows, which also breaks
  shuffle skew: a scatter that explodes chunked rows partial-aggregates per
  chunk before the final combine (classic salting).

Scale notes (100 TB / 10^12 files): edges and adjacency are hash-partitioned
by vertex id (``repartition(n, src)``), so the per-superstep scatter join
state ⋈ adjacency is co-partitioned and does not reshuffle the (large,
static) adjacency side; only the small per-superstep state/message tables
move. Dense id encoding is a one-off sort-based job (order-preserving), so
"min id" component labels stay comparable with the reference's id order.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    ByteType,
    DataType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    ShortType,
    StringType,
    StructField,
    StructType,
)

# The reference's closed value type system (ValueType.java:27-41):
# NULL/BOOLEAN/INT/LONG/FLOAT/DOUBLE/STRING plus ID lists (arrays).
# HugeConverter.convertValue (computer-core/.../input/HugeConverter.java)
# coerces Boolean/Integer/Long/Float/Double/String/Collection and THROWS
# for anything else — no decimals, timestamps, maps, or structs.
_CLOSED_TYPES: tuple[type, ...] = (
    BooleanType,
    IntegerType,
    LongType,
    FloatType,
    DoubleType,
    StringType,
)
_WIDEN: dict[type, DataType] = {ByteType: IntegerType(), ShortType: IntegerType()}


def coerce_property_type(dt: DataType, col_name: str) -> DataType | None:
    """HugeConverter parity: return the coerced Spark type for a property
    column, or None if it is already in the closed set; raise for types
    the reference's converter rejects (HugeConverter.convertValue throws
    ComputerException for unsupported classes)."""
    if isinstance(dt, _CLOSED_TYPES):
        return None
    for narrow, wide in _WIDEN.items():
        if isinstance(dt, narrow):
            return wide
    if isinstance(dt, ArrayType):
        inner = coerce_property_type(dt.elementType, col_name)
        return None if inner is None else ArrayType(inner, dt.containsNull)
    raise ValueError(
        f"property column {col_name!r} has type {dt.simpleString()} outside "
        "the engine's closed value type system (bool/int/long/float/double/"
        "string/array thereof — ValueType.java:27-41; HugeConverter throws "
        "for anything else)"
    )

# Reference default: input.max_edges_in_one_vertex = 200
# (ComputerOptions.java:168-175). We default higher: a Spark row holding a
# few thousand longs is cheap, and fewer chunks mean fewer rows to join.
DEFAULT_ADJ_CHUNK = 4096


@dataclass
class Graph:
    """An immutable graph handle over an edge DataFrame.

    ``edges`` always has columns (src: long, dst: long) and optionally
    ``weight: double``. If built with ``symmetrize=True`` the table already
    contains both directions.
    """

    edges: DataFrame
    directed_edge_count: int | None = None
    num_partitions: int = 32
    _adj_cache: dict = field(default_factory=dict, repr=False)
    _vertices: DataFrame | None = None
    _num_vertices: int | None = None
    _max_vid: int | None = None

    # ---------------------------------------------------------------- build
    @staticmethod
    def from_edges(
        edges: DataFrame,
        symmetrize: bool = True,
        dedup: bool = True,
        drop_self_loops: bool = False,
        vertices: DataFrame | None = None,
        num_partitions: int | None = None,
        weight_col: str | None = None,
        weight_agg: str = "max",
        label_col: str | None = None,
        properties: list[str] | None = None,
        edge_freq: str | None = None,
        props_combiner: str = "min",
        order_col: str | None = None,
    ) -> "Graph":
        """Build a Graph from a raw (src, dst[, weight, label, props...])
        DataFrame.

        symmetrize: add the inverse edge for every input edge (reference
        default, WorkerInputManager.java:104-122); the inverse copy
        carries the same weight/label/property values.
        edge_freq: "single" (one edge per (src,dst)),
        "single_per_label" (one per (src,dst,label) — requires label_col),
        or "multiple" (keep all) — EdgeFrequency.java:26-44; the reference
        default is MULTIPLE, TriangleCount pins SINGLE
        (TriangleCountParams.java:41-42). When None, derived from the
        legacy ``dedup`` flag (True → single, False → multiple).
        label_col: kept on ``edges`` as ``label`` (string) — the edge
        label the reference's filter DSL predicates over
        (LinksSpreadFilter.java:66-96).
        properties: further edge columns kept verbatim on ``edges`` so
        links/rings spread/end conditions can reference them — the
        engine's property map (SURVEY.md §1.1).
        vertices: optional (vid) DataFrame; when given, edges referencing
        unknown vertices are dropped (FileGraphPartition.java:314-317) and
        isolated vertices are preserved.
        weight_agg: how duplicate-edge weights combine under dedup —
        "max" | "min" | "sum" | "first"(min weight order for determinism).
        props_combiner: how duplicate label/property values combine under
        dedup — the reference's pluggable properties combiners at ingest
        (combiner/MergeNewPropertiesCombiner.java,
        MergeOldPropertiesCombiner.java, OverwriteCombiner; applied per
        duplicate in receiver/vertex/VertexMessageRecvPartition.java:38-70
        as combine(old, new)):

        * "min" (default) — deterministic per-column MIN, orderless (the
          engine's r2 behavior; no order column needed);
        * "merge_new" — combine(old, new) keeps OLD values on conflict and
          fills only missing keys from new ⇒ FIRST non-null per column;
        * "merge_old" — old values are putIfAbsent'd into the NEW map ⇒
          LAST non-null per column;
        * "overwrite" — the new properties replace the old wholesale ⇒
          the last duplicate's value, nulls included.

        The reference's "old/new" is arrival order in the recv buffer —
        nondeterministic under parallel ingest (its tests assert only the
        merge rule). This engine makes the order EXPLICIT: the
        first/last-style policies require ``order_col`` (ingest sequence,
        timestamp, file row number), so results are reproducible under
        any partitioning — same trade the deterministic LPA tie-break
        makes. The symmetrized inverse copy carries the same order value,
        so both directions merge identically.
        """
        freq = edge_freq or ("single" if dedup else "multiple")
        if freq not in ("single", "single_per_label", "multiple"):
            raise ValueError(f"unknown edge_freq {freq!r}")
        if freq == "single_per_label" and not label_col:
            raise ValueError("edge_freq='single_per_label' requires label_col")
        if props_combiner not in ("min", "merge_new", "merge_old", "overwrite"):
            raise ValueError(f"unknown props_combiner {props_combiner!r}")
        if props_combiner != "min" and order_col is None:
            raise ValueError(
                f"props_combiner={props_combiner!r} needs order_col: the "
                "reference's old/new is recv-buffer arrival order, which a "
                "distributed dedup must pin to an explicit column"
            )
        props = list(properties or [])
        cols = [F.col("src").cast("long"), F.col("dst").cast("long")]
        if weight_col:
            cols.append(F.col(weight_col).cast("double").alias("weight"))
        if label_col:
            cols.append(F.col(label_col).cast("string").alias("label"))
        # property columns pass through HugeConverter-parity coercion:
        # closed-set types unchanged, byte/short widened to int, anything
        # else (decimal/timestamp/map/struct) rejected like the reference
        for p in props:
            coerced = coerce_property_type(edges.schema[p].dataType, p)
            cols.append(F.col(p).cast(coerced) if coerced is not None else F.col(p))
        if order_col is not None:
            cols.append(F.col(order_col).cast("long").alias("__ord"))
        e = edges.select(*cols)
        extra = (
            (["weight"] if weight_col else [])
            + (["label"] if label_col else [])
            + props
        )
        carry = extra + (["__ord"] if order_col is not None else [])
        if drop_self_loops:
            e = e.where(F.col("src") != F.col("dst"))
        if symmetrize:
            rev = [F.col("dst").alias("src"), F.col("src").alias("dst")] + [
                F.col(c) for c in carry
            ]
            e = e.unionByName(e.select(*rev))
        if freq != "multiple":
            keys = ["src", "dst"] + (
                ["label"] if freq == "single_per_label" else []
            )
            value_cols = [c for c in extra if c not in keys]
            if not value_cols:
                e = e.dropDuplicates(keys).select("src", "dst", *extra)
            else:
                aggs = []
                w_rules = {
                    "max": F.max("weight"),
                    "min": F.min("weight"),
                    "sum": F.sum("weight"),
                    "first": F.min("weight"),
                }
                ord_c = F.col("__ord") if order_col is not None else None

                def prop_agg(c: str):
                    """Reference properties-combiner parity, columnar form:
                    merge_new keeps the FIRST non-null per column (old wins
                    conflicts, new fills absent keys); merge_old the LAST
                    non-null; overwrite the last duplicate's value, nulls
                    included; "min" the orderless per-column MIN. Struct
                    min/max orders by (__ord, value) — value only
                    tie-breaks equal order ranks, deterministically."""
                    col = F.col(c)
                    pair = F.struct(ord_c.alias("o"), col.alias("v")) if ord_c is not None else None
                    if props_combiner == "merge_new":
                        return F.min(F.when(col.isNotNull(), pair))["v"].alias(c)
                    if props_combiner == "merge_old":
                        return F.max(F.when(col.isNotNull(), pair))["v"].alias(c)
                    if props_combiner == "overwrite":
                        return F.max(pair)["v"].alias(c)
                    return F.min(c).alias(c)

                for c in value_cols:
                    if c == "weight":
                        if weight_agg not in w_rules:
                            raise ValueError(f"unknown weight_agg {weight_agg!r}")
                        aggs.append(w_rules[weight_agg].alias("weight"))
                    else:
                        aggs.append(prop_agg(c))
                e = e.groupBy(*keys).agg(*aggs).select("src", "dst", *extra)
        elif order_col is not None:
            e = e.select("src", "dst", *extra)
        if vertices is not None:
            v = vertices.select(F.col(vertices.columns[0]).cast("long").alias("vid"))
            v = v.dropDuplicates(["vid"])
            e = (
                e.join(v.withColumnRenamed("vid", "src"), "src", "inner")
                .join(v.withColumnRenamed("vid", "dst"), "dst", "inner")
                .select("src", "dst", *extra)
            )
        n = num_partitions or e.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
        n = int(n)
        # Hash-partition by src: co-locates the scatter join for every
        # superstep (HashPartitioner.java:43-52 equivalent; Spark reuses
        # this partitioning across stages).
        e = e.repartition(n, "src")
        g = Graph(edges=e, num_partitions=n)
        if vertices is not None:
            g._vertices = v
        return g

    # ------------------------------------------------------------ accessors
    def vertices(self) -> DataFrame:
        """(vid) — endpoints of the edge table plus any isolated vertices
        supplied at build time."""
        if self._vertices is not None:
            return self._vertices
        v = (
            self.edges.select(F.col("src").alias("vid"))
            .unionByName(self.edges.select(F.col("dst").alias("vid")))
            .dropDuplicates(["vid"])
        )
        self._vertices = v
        return v

    def num_vertices(self) -> int:
        if self._num_vertices is None:
            self._num_vertices = self.vertices().count()
        return self._num_vertices

    def max_vid(self) -> int:
        """Largest vertex id — bounds the dense accumulator of the Arrow
        gather-scatter kernel (graph.scatter)."""
        if self._max_vid is None:
            row = self.edges.agg(
                F.max(F.greatest(F.col("src"), F.col("dst"))).alias("m")
            ).collect()[0]
            self._max_vid = int(row["m"]) if row["m"] is not None else -1
        return self._max_vid

    def degrees(self, weighted: bool = False) -> DataFrame:
        """(vid, deg) — out-degree of the (already symmetrized) edge table;
        0 for isolated vertices. This is the reference's ``numEdges()``
        under default inverse-edge loading."""
        agg = (
            F.sum("weight").alias("deg")
            if weighted
            else F.count(F.lit(1)).cast("long").alias("deg")
        )
        d = self.edges.groupBy(F.col("src").alias("vid")).agg(agg)
        zero = F.lit(0.0) if weighted else F.lit(0).cast("long")
        return (
            self.vertices()
            .join(d, "vid", "left")
            .select("vid", F.coalesce("deg", zero).alias("deg"))
        )

    def adjacency(
        self,
        chunk: int = DEFAULT_ADJ_CHUNK,
        cache: bool = True,
        keep_chunk_no: bool = False,
    ) -> DataFrame:
        """Chunked adjacency ``(vid[, chunk_no int], nbrs array<long>, deg long)``.

        ``deg`` is the vertex's TOTAL degree (repeated on every chunk row).
        Hubs with degree > chunk are split across ceil(deg/chunk) rows —
        the Spark analogue of the reference's <=200-edge sub-entries
        (ComputerOptions.java:168-175; EdgesInput.java:90-143) and the
        skew-salting required by the north rule: exploding a chunk never
        materializes a hub's full neighbor list in one task, and downstream
        groupBy(dst) partial-aggregates per chunk.

        ``keep_chunk_no=True`` exposes the chunk ordinal (chunks are
        consecutive slices of the globally sorted neighbor list, so
        global index ``i`` lives in chunk ``i div chunk`` at offset
        ``i mod chunk`` — the two-level indexed choice random_walks
        uses). One frame is cached per chunk size; the chunk_no-free
        shape is a projection of it, so both share the cache.
        """
        key = chunk
        if key not in self._adj_cache:
            adj = (
                self.edges.groupBy("src")
                .agg(F.sort_array(F.collect_list("dst")).alias("all_nbrs"))
                .select(
                    F.col("src").alias("vid"),
                    F.col("all_nbrs"),
                    F.size("all_nbrs").cast("long").alias("deg"),
                )
            )
            adj = adj.select(
                "vid",
                "deg",
                F.posexplode(
                    F.transform(
                        F.sequence(
                            F.lit(0),
                            F.floor((F.col("deg") - 1) / F.lit(chunk)).cast("int"),
                        ),
                        lambda i: F.slice(F.col("all_nbrs"), i * chunk + 1, chunk),
                    )
                ).alias("chunk_no", "nbrs"),
            ).select("vid", "chunk_no", "nbrs", "deg")
            # Persist hash-partitioned AND sorted by vid: the cached relation
            # then advertises both, so the per-superstep scatter SMJ needs no
            # exchange and no re-sort on the (large, static) adjacency side —
            # the Spark analogue of the reference's id-sorted partition files
            # merged-joined each superstep (FileGraphPartition.compute:158-214).
            adj = adj.repartition(self.num_partitions, "vid").sortWithinPartitions("vid")
            if cache:
                adj = adj.persist()
            self._adj_cache[key] = adj
        adj = self._adj_cache[key]
        return adj if keep_chunk_no else adj.select("vid", "nbrs", "deg")

    def flat_edges(
        self,
        cache: bool = True,
        all_cols: bool = False,
        build_hash: bool = False,
    ) -> DataFrame:
        """Flat edges hash-partitioned by src and sorted within
        partitions — the co-partitioned STATIC side for every
        per-superstep ``frontier ⋈ edges`` join (flat Arrow scatter,
        Brandes/closeness level floods, rings/links path floods, k-core
        peeling). Cached like the chunked adjacency: without it each
        level re-scans the source and re-shuffles the full edge table,
        a D× constant factor at scale; the persisted relation instead
        advertises HashPartitioning(src) + src sort order, so the join
        needs no exchange and no re-sort on the large static side.

        ``all_cols=False`` keeps only (src, dst); ``all_cols=True``
        keeps every edge column (weights, labels, carry props, edge
        ids) for operators that filter or project them per superstep —
        a filter/projection over the cached frame preserves the
        partitioning and sort, so the no-exchange property survives.

        ``build_hash=True`` adds a ``shuffle_hash`` hint: build the SHJ
        hash map on THIS (cached, already-partitioned) side instead of
        sort-merge joining. Choose by the ratio of the DYNAMIC side to
        the static side, measured per family on the sf0.1 graph
        (BENCH_flat_edges_ab.json):

        * multi-source path floods (Brandes/closeness/rings/links,
          k·V-row frontiers that dwarf E) → ``True``: SMJ would re-SORT
          the huge frontier every level (+16% on 64-source Brandes);
          SHJ streams it unsorted, paying only an E/num_partitions
          hash build, and closeness_32src measured −20%.
        * V-row dynamic sides against E-row static (PageRank contribs,
          V ≪ E) → ``False``: sorting V rows per superstep is cheaper
          than re-building an E-row hash map (pagerank measured ~+10%
          with the hint), and SMJ reuses the cached sort for free.
        """
        key = "flat_all" if all_cols else "flat"
        if key not in self._adj_cache:
            base = self.edges if all_cols else self.edges.select("src", "dst")
            fe = (
                base.repartition(self.num_partitions, "src")
                .sortWithinPartitions("src")
            )
            if cache:
                fe = fe.persist()
            self._adj_cache[key] = fe
        fe = self._adj_cache[key]
        return fe.hint("shuffle_hash") if build_hash else fe

    def unpersist(self) -> None:
        for adj in self._adj_cache.values():
            adj.unpersist()
        self._adj_cache.clear()


def dense_ids(df: DataFrame, col: str, order: str = "lex") -> DataFrame:
    """Order-preserving dense encoding ``(orig, vid long)``.

    The reference orders ids shortlex over their byte encoding — LENGTH
    first, then unsigned byte-lexicographic
    (computer-api/.../util/BytesUtil.java:50-76); for MSB varint longs that
    equals numeric order, and for UTF8 ids it is shortlex, NOT plain
    lexicographic (SURVEY.md §1.3). ``order="shortlex"`` reproduces the
    UTF8 rule exactly (sort key = (length, value)), so WCC's "min id"
    component labels translate back to the id the reference would pick
    even for variable-length string ids. ``order="lex"`` (default) is
    plain lexicographic — correct for fixed-width keys like the corpus's
    ``repo_%06d`` names, where the two orders coincide.

    ``order="uuid"`` implements the third IdType (IdType.java:25-28,
    LONG/UTF8/UUID): BytesId.of(UUID) serializes msb then lsb as 16
    big-endian bytes (BytesId.java:79-92) and compares them UNSIGNED
    byte-lexicographic (BytesUtil.compare via BytesId.compareTo:174-182)
    — NOT java.util.UUID.compareTo's signed-long order, so a UUID whose
    first byte is >= 0x80 sorts AFTER small ones, where signed order
    would put it first. Sort key = the unhexed 16-byte binary of the
    canonical hex form (Spark binary comparison is unsigned
    lexicographic, exactly BytesUtil.compare); fixed 16-byte width makes
    shortlex == lex here.

    Two distributed passes, Arrow end to end (an RDD ``zipWithIndex`` would
    push every row through Python serialization — measured 10x slower at
    10^6 keys): (1) range-partition + sort the distinct keys and count
    rows per partition; (2) assign ``prefix_offset + local position`` per
    partition in one mapInPandas. Range partitions are globally ordered,
    so the assigned id equals the key's global rank regardless of where
    the sampled boundaries fall. Scales to 10^9+ keys; only the per-
    partition counts touch the driver.
    """
    spark = df.sparkSession
    n = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    if order == "shortlex":
        keys = [F.length(F.col("orig")), F.col("orig")]
    elif order == "lex":
        keys = [F.col("orig")]
    elif order == "uuid":
        # BytesId UUID order: the 16 raw bytes (msb,lsb big-endian),
        # unsigned — unhex the canonical hex form and sort the binary
        keys = [F.unhex(F.translate(F.lower(F.col("orig")), "-", ""))]
    else:
        raise ValueError(f"unknown order {order!r}")
    distinct = (
        df.select(F.col(col).alias("orig"))
        .dropDuplicates(["orig"])
        .repartitionByRange(n, *keys)
        .sortWithinPartitions(*keys)
        .withColumn("pid", F.spark_partition_id())
        .persist()
    )
    counts = {
        int(r["pid"]): int(r["cnt"])
        for r in distinct.groupBy("pid").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    schema = StructType(
        [distinct.schema["orig"], StructField("vid", LongType(), False)]
    )

    def assign(batches):
        import pandas as pd

        pos = None
        for pdf in batches:
            if not len(pdf):
                continue
            if pos is None:
                pos = offsets[int(pdf["pid"].iloc[0])]
            vids = range(pos, pos + len(pdf))
            pos += len(pdf)
            yield pd.DataFrame({"orig": pdf["orig"], "vid": list(vids)})

    # materialize the dictionary eagerly, then release the intermediate
    # persisted distinct-keys frame (it would otherwise pin cache blocks
    # for the whole session — VERDICT r1 hygiene item)
    out = distinct.mapInPandas(assign, schema).localCheckpoint(eager=True)
    distinct.unpersist()
    return out
