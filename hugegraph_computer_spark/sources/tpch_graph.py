"""Deterministic graph derivations from the driver's TPC-H-ish test tables.

These give the graph algorithms oracle-checkable inputs from
``/root/testdata/sf*/``: the identical derivation is expressed in ANSI SQL
in ``__spark_entry__.oracle_sql`` so DuckDB and this engine operate on the
same edge set.

* ``customer_supplier_edges`` — bipartite: customer c bought from supplier s
  (via orders ⋈ lineitem). Suppliers are offset by SUPPLIER_OFFSET so the
  two key spaces cannot collide. ~|distinct (cust, supp)| edges.
* ``copurchase_edges`` — part co-purchase: two parts appearing on the same
  order (p1 < p2). Has triangles, unlike the bipartite graph, so it feeds
  triangle count / clustering coefficient.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

SUPPLIER_OFFSET = 1_000_000


def _read(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def customer_supplier_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(src=o_custkey, dst=SUPPLIER_OFFSET+l_suppkey), distinct."""
    orders = _read(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    lineitem = _read(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    return (
        lineitem.join(orders, lineitem["l_orderkey"] == orders["o_orderkey"])
        .select(
            F.col("o_custkey").cast("long").alias("src"),
            (F.lit(SUPPLIER_OFFSET) + F.col("l_suppkey")).cast("long").alias("dst"),
        )
        .dropDuplicates(["src", "dst"])
    )


def customer_supplier_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same edges with weight = Σ l_quantity per (customer, supplier)."""
    orders = _read(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    lineitem = _read(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_quantity"
    )
    return (
        lineitem.join(orders, lineitem["l_orderkey"] == orders["o_orderkey"])
        .groupBy(
            F.col("o_custkey").cast("long").alias("src"),
            (F.lit(SUPPLIER_OFFSET) + F.col("l_suppkey")).cast("long").alias("dst"),
        )
        .agg(F.sum("l_quantity").cast("double").alias("weight"))
    )


def copurchase_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(src=p1, dst=p2) for distinct part pairs on the same order, p1<p2."""
    li = _read(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    a = li.alias("a")
    b = li.alias("b")
    return (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .select(
            F.col("a.l_partkey").cast("long").alias("src"),
            F.col("b.l_partkey").cast("long").alias("dst"),
        )
        .dropDuplicates(["src", "dst"])
    )


def nation_same_region_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(src=n1, dst=n2) for nation pairs sharing a region, n1 < n2 — a
    small clique-per-region graph (25 vertices at any sf) suited to the
    exponential path algorithms (rings detection) and all-pairs closeness."""
    n = _read(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    a, b = n.alias("a"), n.alias("b")
    return (
        a.join(
            b,
            (F.col("a.n_regionkey") == F.col("b.n_regionkey"))
            & (F.col("a.n_nationkey") < F.col("b.n_nationkey")),
        )
        .select(
            F.col("a.n_nationkey").cast("long").alias("src"),
            F.col("b.n_nationkey").cast("long").alias("dst"),
        )
    )


def customer_supplier_labeled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(src=o_custkey, dst=SUPPLIER_OFFSET+l_suppkey, label=l_returnflag),
    NOT deduplicated — feeds Graph.from_edges(edge_freq='single_per_label')
    to exercise the reference's SINGLE_PER_LABEL edge frequency
    (EdgeFrequency.java:33-37): one edge survives per (src, dst, label)."""
    orders = _read(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    lineitem = _read(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_returnflag"
    )
    return (
        lineitem.join(orders, lineitem["l_orderkey"] == orders["o_orderkey"])
        .select(
            F.col("o_custkey").cast("long").alias("src"),
            (F.lit(SUPPLIER_OFFSET) + F.col("l_suppkey")).cast("long").alias("dst"),
            F.col("l_returnflag").alias("label"),
        )
    )


def nation_same_region_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nation clique edges with a deterministic per-edge property
    ``weight = (n1 + n2) % 7`` — a stand-in edge property (expressible in
    the DuckDB oracle) for the links/rings property-predicate DSL."""
    e = nation_same_region_edges(spark, sf_dir)
    return e.select(
        "src", "dst", ((F.col("src") + F.col("dst")) % 7).cast("double").alias("weight")
    )


def nation_same_region_labeled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nation clique edges with deterministic label AND weight properties
    for the reference's JSON filter DSL (rings/links):
    ``weight = (src+dst) % 7``, ``label = 'know' if (src+dst) % 3 == 0
    else 'pay'`` — both engine-portable expressions the DuckDB oracles
    re-derive."""
    e = nation_same_region_weighted(spark, sf_dir)
    return e.select(
        "src", "dst", "weight",
        F.when((F.col("src") + F.col("dst")) % 3 == 0, "know")
        .otherwise("pay")
        .alias("label"),
    )


def nation_vertex_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vertex property table for the DSL's vertex filters:
    ``(vid, label='user', weight = n_nationkey % 3)``."""
    return _read(spark, sf_dir, "nation").select(
        F.col("n_nationkey").cast("long").alias("vid"),
        F.lit("user").alias("label"),
        (F.col("n_nationkey") % 3).cast("double").alias("weight"),
    )


def nation_vertex_props_named(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vertex props with a NULLABLE string property for the builtin-
    function DSL gate (round-4 Aviator surface): ``name`` is NULL when
    ``nationkey % 4 == 0`` (exercising Aviator ``nil`` = missing
    property), else ``'user_<nationkey % 5>'`` — both engine-portable."""
    return _read(spark, sf_dir, "nation").select(
        F.col("n_nationkey").cast("long").alias("vid"),
        F.lit("user").alias("label"),
        (F.col("n_nationkey") % 3).cast("double").alias("weight"),
        F.when(F.col("n_nationkey") % 4 == 0, F.lit(None).cast("string"))
        .otherwise(
            F.concat(F.lit("user_"), (F.col("n_nationkey") % 5).cast("string"))
        )
        .alias("name"),
    )


NATION_OFFSET = 100
SUPPLIER_TREE_OFFSET = 200


def hierarchy_edges_string_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The supplier—nation—region forest with STRING vertex ids
    ('s<k>', 'n<k>', 'r<k>', variable width) — exercises the reference's
    UTF8 id semantics: BytesId orders shortlex (length first, then bytes —
    BytesUtil.java:50-76), so e.g. 'n8' < 'n12' even though plain
    lexicographic order says otherwise. WCC's min-id component label
    depends on this."""
    sup = _read(spark, sf_dir, "supplier").select(
        F.concat(F.lit("s"), F.col("s_suppkey").cast("string")).alias("src_id"),
        F.concat(F.lit("n"), F.col("s_nationkey").cast("string")).alias("dst_id"),
    )
    nat = _read(spark, sf_dir, "nation").select(
        F.concat(F.lit("n"), F.col("n_nationkey").cast("string")).alias("src_id"),
        F.concat(F.lit("r"), F.col("n_regionkey").cast("string")).alias("dst_id"),
    )
    return sup.unionByName(nat)


def _uuid_of(col):
    """Deterministic UUID-shaped id from a key: md5 hex grouped
    8-4-4-4-12 (lowercase — canonical form). md5 is engine-portable, so
    DuckDB derives identical uuids; uniform hex means ~half the ids have
    a first byte >= 0x80, exercising the UNSIGNED byte order that
    distinguishes BytesId's UUID comparison (BytesUtil.compare on the
    msb/lsb big-endian bytes, BytesId.java:79-92,174-182) from
    java.util.UUID.compareTo's signed-long order."""
    h = F.md5(F.concat(F.lit("uuid:"), col.cast("string")))
    return F.concat_ws(
        "-",
        F.substring(h, 1, 8),
        F.substring(h, 9, 4),
        F.substring(h, 13, 4),
        F.substring(h, 17, 4),
        F.substring(h, 21, 12),
    )


def hierarchy_edges_uuid_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The supplier—nation—region forest with UUID vertex ids — the third
    IdType (IdType.java:25-28). Ids are md5-derived from the long vids of
    ``hierarchy_edges`` so both engines synthesize the same uuids."""
    e = hierarchy_edges(spark, sf_dir)
    return e.select(
        _uuid_of(F.col("src")).alias("src_id"),
        _uuid_of(F.col("dst")).alias("dst_id"),
    )


def hierarchy_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """supplier—nation ∪ nation—region forest (one tree per region).

    vids: nation = n_nationkey, region = 100 + r_regionkey,
    supplier = 200 + s_suppkey. Trees have exact closed-form betweenness
    (pairs-through-vertex from removal-component sizes), which the
    DuckDB oracle for betweenness_centrality exploits."""
    sup = _read(spark, sf_dir, "supplier").select(
        (F.lit(SUPPLIER_TREE_OFFSET) + F.col("s_suppkey")).cast("long").alias("src"),
        F.col("s_nationkey").cast("long").alias("dst"),
    )
    nat = _read(spark, sf_dir, "nation").select(
        F.col("n_nationkey").cast("long").alias("src"),
        (F.lit(NATION_OFFSET) + F.col("n_regionkey")).cast("long").alias("dst"),
    )
    return sup.unionByName(nat)


def lineitem_ordered_prop_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(src, dst, ord, qty) with DUPLICATE (src,dst) pairs at different
    ingest ranks — the properties-combiner gate input. src/dst fold part
    and supplier keys into a small id space so duplicates are guaranteed;
    ``ord`` is a deterministic per-row ingest rank and ``qty`` a property
    made NULLABLE on a value-based rule, so merge_new / merge_old /
    overwrite / min all produce DIFFERENT merged values (the oracle
    distinguishes the policies)."""
    li = _read(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity"
    )
    # ingest rank = portable 60-bit md5 of the full row key — unique per
    # row (the testdata repeats (orderkey, linenumber)!), deterministic,
    # and bit-equal in DuckDB ('0x'||substr(md5(...),1,15))::BIGINT
    key = F.concat_ws(
        ":",
        F.col("l_orderkey").cast("string"),
        F.col("l_linenumber").cast("string"),
        F.col("l_partkey").cast("string"),
        F.col("l_suppkey").cast("string"),
    )
    return li.select(
        (F.col("l_partkey") % 50).cast("long").alias("src"),
        (F.lit(100) + F.col("l_suppkey") % 50).cast("long").alias("dst"),
        F.conv(F.substring(F.md5(key), 1, 15), 16, 10).cast("long").alias("ord"),
        # qty NULL whenever quantity is a multiple of 10: exercises the
        # null-filling difference between merge_* and overwrite
        F.when(F.col("l_quantity") % 10 != 0, F.col("l_quantity").cast("double")).alias("qty"),
    )
