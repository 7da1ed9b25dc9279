"""ANSI-SQL (DuckDB) oracle builders mirroring every engine query exactly.

The driver's correctness gate runs each ``__spark_entry__.queries()`` entry
on Spark and the matching ``oracle_sql()`` string on DuckDB over the same
parquet tables, then compares row counts + schema + order-insensitive value
hashes. These builders generate SQL that reproduces the engine's semantics
*operation for operation* — including the reference's graph-construction
rules (symmetrize + dedup, SURVEY.md §1.4) and the exact PageRank recurrence
(PageRank.java:64-101; SURVEY.md §2.12), unrolled iteration by iteration
because the per-superstep global aggregates (Σrank, dangling mass) cannot
live inside a recursive CTE.

Floating-point outputs are rounded identically on both sides (the engine
rounds in the DataFrame plan, the oracle in SQL) so re-associated sums
cannot flip the value hash.
"""

from __future__ import annotations

SUPPLIER_OFFSET = 1_000_000

# Symmetrized, deduplicated customer–supplier edge table — the SQL twin of
# sources.tpch_graph.customer_supplier_edges + Graph.from_edges(symmetrize,
# dedup) (WorkerInputManager.java:104-122; EdgeFrequency SINGLE).
EDGES_CS = f"""
e0 AS MATERIALIZED (
  SELECT DISTINCT CAST(o_custkey AS BIGINT) AS src,
         CAST({SUPPLIER_OFFSET} + l_suppkey AS BIGINT) AS dst
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
),
e AS MATERIALIZED (SELECT src, dst FROM e0 UNION SELECT dst AS src, src AS dst FROM e0)
"""

# Part co-purchase graph (has triangles): distinct part pairs per order.
EDGES_COPURCHASE = """
e0 AS MATERIALIZED (
  SELECT DISTINCT CAST(a.l_partkey AS BIGINT) AS src,
         CAST(b.l_partkey AS BIGINT) AS dst
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),
e AS MATERIALIZED (SELECT src, dst FROM e0 UNION SELECT dst AS src, src AS dst FROM e0)
"""


def degree_sql() -> str:
    return f"""
WITH {EDGES_CS}
SELECT src AS vid, CAST(COUNT(*) AS DOUBLE) AS degree FROM e GROUP BY src
"""


# Directed customer→supplier load: NO inverse-edge union — the oracle twin
# of Graph.from_edges(symmetrize=False), i.e. the reference's
# input.vertex_with_edges_bothdirection=true (ComputerOptions.java:811-817).
EDGES_CS_DIRECTED = f"""
e AS MATERIALIZED (
  SELECT DISTINCT CAST(o_custkey AS BIGINT) AS src,
         CAST({SUPPLIER_OFFSET} + l_suppkey AS BIGINT) AS dst
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
)
"""

# directed graphs have dst-only vertices; v must be BOTH endpoint sets
V_BOTH_ENDPOINTS = (
    "v AS MATERIALIZED (SELECT src AS vid FROM e UNION SELECT dst FROM e)"
)


def degree_directed_sql() -> str:
    """Out-degree on the DIRECTED load: suppliers (dst-only) have 0."""
    return f"""
WITH {EDGES_CS_DIRECTED},
{V_BOTH_ENDPOINTS},
d AS MATERIALIZED (
  SELECT src AS vid, CAST(COUNT(*) AS DOUBLE) AS degree FROM e GROUP BY src
)
SELECT v.vid, COALESCE(d.degree, 0.0) AS degree
FROM v LEFT JOIN d ON v.vid = d.vid
"""


def pagerank_directed_sql(supersteps: int = 6, round_to: int = 9) -> str:
    """Unrolled PageRank over the DIRECTED customer→supplier load — every
    supplier is dangling (out-degree 0), so the dangling-mass
    redistribution term carries real weight instead of being ~0 as on the
    symmetric graph."""
    return pagerank_sql(
        supersteps=supersteps,
        round_to=round_to,
        edges_cte=EDGES_CS_DIRECTED,
        vertices_cte=V_BOTH_ENDPOINTS,
    )


def degree_weighted_sql() -> str:
    # weight = Σ l_quantity per (customer, supplier); symmetrized copy
    # carries the same weight both directions (Graph.from_edges keeps the
    # max per pair — here each pair occurs once, so max == the value).
    return f"""
WITH w0 AS MATERIALIZED (
  SELECT CAST(o_custkey AS BIGINT) AS src,
         CAST({SUPPLIER_OFFSET} + l_suppkey AS BIGINT) AS dst,
         CAST(SUM(l_quantity) AS DOUBLE) AS weight
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  GROUP BY 1, 2
),
w AS MATERIALIZED (
  SELECT src, dst, MAX(weight) AS weight FROM (
    SELECT src, dst, weight FROM w0
    UNION ALL SELECT dst AS src, src AS dst, weight FROM w0
  ) GROUP BY src, dst
)
SELECT src AS vid, ROUND(CAST(SUM(weight) AS DOUBLE), 6) AS degree
FROM w GROUP BY src
"""


def graph_stats_sql() -> str:
    """Symmetrized-degree summary of the customer–supplier graph (twin of
    operators.stats.graph_stats; SuperstepStat analogue)."""
    return f"""
WITH {EDGES_CS},
d AS MATERIALIZED (SELECT src AS vid, CAST(COUNT(*) AS BIGINT) AS deg FROM e GROUP BY src),
a AS MATERIALIZED (SELECT COUNT(*) AS nv, SUM(deg) AS ne, MAX(deg) AS mx FROM d)
SELECT 'n_vertices' AS stat, CAST(nv AS DOUBLE) AS value FROM a
UNION ALL SELECT 'sym_edges', CAST(ne AS DOUBLE) FROM a
UNION ALL SELECT 'max_degree', CAST(mx AS DOUBLE) FROM a
UNION ALL SELECT 'avg_degree', ROUND(CAST(ne AS DOUBLE) / nv, 6) FROM a
"""


def degree_per_label_sql() -> str:
    """SINGLE_PER_LABEL edge frequency (EdgeFrequency.java:33-37): one
    edge survives per (src, dst, label); degree counts the symmetrized
    per-label-deduped adjacency."""
    return f"""
WITH e0 AS MATERIALIZED (
  SELECT DISTINCT CAST(o_custkey AS BIGINT) AS src,
         CAST({SUPPLIER_OFFSET} + l_suppkey AS BIGINT) AS dst,
         l_returnflag AS label
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
),
e AS MATERIALIZED (
  SELECT src, dst, label FROM e0
  UNION SELECT dst AS src, src AS dst, label FROM e0
)
SELECT src AS vid, CAST(COUNT(*) AS DOUBLE) AS degree FROM e GROUP BY src
"""


def links_weighted_sql() -> str:
    """Links with an edge-PROPERTY predicate in the spread condition —
    the reference's LinksSpreadFilter property DSL
    (links/filter/LinksSpreadFilter.java:66-96) over the engine's edge
    property columns: weight = (n1+n2)%7, spread along increasing edges
    with weight >= 2, end on arrival at vid >= 15."""
    return """
WITH RECURSIVE e0 AS MATERIALIZED (
  SELECT CAST(a.n_nationkey AS BIGINT) AS src, CAST(b.n_nationkey AS BIGINT) AS dst,
         CAST((a.n_nationkey + b.n_nationkey) % 7 AS DOUBLE) AS weight
  FROM nation a JOIN nation b
    ON a.n_regionkey = b.n_regionkey AND a.n_nationkey < b.n_nationkey
),
e AS MATERIALIZED (
  SELECT src, dst, MIN(weight) AS weight FROM (
    SELECT src, dst, weight FROM e0
    UNION ALL SELECT dst AS src, src AS dst, weight FROM e0
  ) GROUP BY src, dst
),
p(cur, path, ended) AS (
  SELECT vid, [vid], vid >= 15
  FROM (SELECT DISTINCT src AS vid FROM e) WHERE vid < 5
  UNION ALL
  SELECT e.dst, list_append(p.path, e.dst), e.dst >= 15
  FROM p JOIN e ON p.cur = e.src
  WHERE NOT p.ended AND e.dst > e.src AND e.weight >= 2
)
SELECT cur AS vid, array_to_string(path, '-') AS path_str FROM p WHERE ended
"""


def wcc_sql() -> str:
    # Component label = min vertex id reachable in the symmetric graph —
    # the Wcc.java min-label fixpoint, computed as a reachability closure.
    return f"""
WITH RECURSIVE {EDGES_CS},
v AS MATERIALIZED (SELECT DISTINCT src AS vid FROM e),
reach(vid, r) AS (
  SELECT vid, vid FROM v
  UNION
  SELECT reach.vid, e.dst FROM reach JOIN e ON reach.r = e.src
)
SELECT vid, MIN(r) AS component FROM reach GROUP BY vid
"""


def pagerank_sql(
    supersteps: int = 6,
    alpha: float = 0.15,
    round_to: int = 9,
    edges_cte: str = EDGES_CS,
    vertices_cte: str | None = None,
    final_select: str | None = None,
) -> str:
    """Unrolled reference PageRank (SURVEY.md §2.12): superstep 0 sets
    rank=1/N; each update computes
    ``((dangling_prev/N + Σ msgs) * (1-alpha) + alpha/N) / cumulative_prev``
    with the PREVIOUS superstep's global aggregates — one CTE pair per
    superstep.

    ``edges_cte`` must define ``e(src, dst)`` (symmetrized, deduped);
    ``vertices_cte`` optionally defines ``v(vid)`` (default: edge
    endpoints) — a vertex absent from ``e.src`` is dangling (deg 0), per
    the reference's numEdges()==0 accounting."""
    if vertices_cte is None:
        vertices_cte = "v AS MATERIALIZED (SELECT DISTINCT src AS vid FROM e)"
    parts = [
        f"WITH {edges_cte}",
        *([vertices_cte] if vertices_cte else []),
        "dg AS MATERIALIZED (SELECT src AS vid, CAST(COUNT(*) AS BIGINT) AS deg FROM e GROUP BY src)",
        "d AS MATERIALIZED (SELECT v.vid, COALESCE(dg.deg, 0) AS deg "
        "FROM v LEFT JOIN dg ON v.vid = dg.vid)",
        "nv AS MATERIALIZED (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM d)",
        "r0 AS MATERIALIZED (SELECT vid, deg, (SELECT 1.0/n FROM nv) AS rank FROM d)",
        "a0 AS MATERIALIZED (SELECT SUM(rank) AS cum, "
        "COALESCE(SUM(CASE WHEN deg = 0 THEN rank END), 0.0) AS dang FROM r0)",
    ]
    for s in range(1, supersteps):
        p, c = s - 1, s
        parts.append(
            f"m{c} AS MATERIALIZED (SELECT e.dst AS vid, SUM(r.rank / r.deg) AS msg "
            f"FROM r{p} r JOIN e ON r.vid = e.src WHERE r.deg > 0 GROUP BY e.dst)"
        )
        parts.append(
            f"r{c} AS MATERIALIZED (SELECT r.vid, r.deg, "
            f"((a.dang / (SELECT n FROM nv) + COALESCE(m.msg, 0.0)) * {1.0 - alpha!r} "
            f"+ {alpha!r} / (SELECT n FROM nv)) / a.cum AS rank "
            f"FROM r{p} r CROSS JOIN a{p} a LEFT JOIN m{c} m ON r.vid = m.vid)"
        )
        parts.append(
            f"a{c} AS MATERIALIZED (SELECT SUM(rank) AS cum, "
            f"COALESCE(SUM(CASE WHEN deg = 0 THEN rank END), 0.0) AS dang FROM r{c})"
        )
    last = supersteps - 1
    if final_select is None:
        final_select = (
            f"SELECT vid, ROUND(CAST(rank AS DOUBLE), {round_to}) AS rank FROM r{last}"
        )
    else:
        final_select = final_select.format(last=last, round_to=round_to)
    return ",\n".join(parts) + "\n" + final_select


def wcc_string_ids_sql() -> str:
    """WCC over the supplier—nation—region forest with STRING vertex ids;
    the component label is the SHORTLEX-minimum reachable id — length
    first, then byte order (BytesUtil.java:50-76) — e.g. 'n8' beats 'n12'.
    Twin of dense_ids(order='shortlex') + wcc + decode."""
    return """
WITH RECURSIVE e0 AS MATERIALIZED (
  SELECT 's' || s_suppkey AS src, 'n' || s_nationkey AS dst FROM supplier
  UNION ALL
  SELECT 'n' || n_nationkey AS src, 'r' || n_regionkey AS dst FROM nation
),
e AS MATERIALIZED (SELECT src, dst FROM e0 UNION SELECT dst AS src, src AS dst FROM e0),
v AS MATERIALIZED (SELECT DISTINCT src AS vid FROM e),
reach(vid, r) AS (
  SELECT vid, vid FROM v
  UNION
  SELECT reach.vid, e.dst FROM reach JOIN e ON reach.r = e.src
)
SELECT vid AS id, r AS component FROM (
  SELECT vid, r, ROW_NUMBER() OVER (
    PARTITION BY vid ORDER BY length(r), r) AS rn
  FROM reach
) WHERE rn = 1
"""


def wcc_uuid_ids_sql() -> str:
    """WCC over the hierarchy forest with md5-derived UUID vertex ids;
    the component label is the BYTE-ORDER-minimum reachable uuid —
    BytesId serializes a UUID as 16 big-endian bytes (msb,lsb;
    BytesId.java:79-92) and compares unsigned (compareTo:174-182).
    For canonical lowercase-hex uuids, unsigned byte order equals plain
    string order (hex digits are monotone in byte value and the dashes
    sit at fixed positions), so the oracle's ORDER BY r is exactly the
    reference's order — while java.util.UUID.compareTo (signed longs)
    would disagree on ~half of these md5-uniform ids. Twin of
    dense_ids(order='uuid') + wcc + decode."""
    def u(x: str) -> str:
        h = f"md5('uuid:' || {x})"
        return (
            f"substr({h},1,8)||'-'||substr({h},9,4)||'-'||substr({h},13,4)"
            f"||'-'||substr({h},17,4)||'-'||substr({h},21,12)"
        )

    return f"""
WITH RECURSIVE raw AS MATERIALIZED (
  SELECT 200 + s_suppkey AS a, s_nationkey::BIGINT AS b FROM supplier
  UNION ALL
  SELECT n_nationkey AS a, 100 + n_regionkey AS b FROM nation
),
e0 AS MATERIALIZED (
  SELECT {u('a')} AS src, {u('b')} AS dst FROM raw
),
e AS MATERIALIZED (SELECT src, dst FROM e0 UNION SELECT dst AS src, src AS dst FROM e0),
v AS MATERIALIZED (SELECT DISTINCT src AS vid FROM e),
reach(vid, r) AS (
  SELECT vid, vid FROM v
  UNION
  SELECT reach.vid, e.dst FROM reach JOIN e ON reach.r = e.src
)
SELECT vid AS id, r AS component FROM (
  SELECT vid, r, ROW_NUMBER() OVER (PARTITION BY vid ORDER BY r) AS rn
  FROM reach
) WHERE rn = 1
"""


def corpus_edges_sql(
    n_repos: int = 200,
    files_per_repo: int = 4,
    mean_imports: int = 4,
    seed: int = 42,
) -> str:
    """SQL twin of sources.corpus.synth_corpus + sources.extract: the
    corpus generator draws import targets as a PURE md5 HASH of
    (seed, file index, draw index) with square-law rank bias
    (corpus.file_row), so DuckDB re-derives the exact repo→repo edge list
    without ever seeing the corpus: hex(md5) → 60-bit int → 20-bit draw x
    → target (n_repos·x²)>>40, java files (i%29==7) excluded like the
    extractor's lang filter, self-imports dropped, DISTINCT at repo level,
    then symmetrize+dedup (Graph.from_edges). Defines ``e(src,dst)`` and
    ``v(vid)`` = ALL repos (the dictionary), so import-less repos stay in
    N exactly like the reference's load-all-vertices input."""
    n_files = n_repos * files_per_repo
    mmax = 2 * mean_imports + 1
    xmod = 1 << 20
    shift = 40
    return f"""
cf AS MATERIALIZED (
  SELECT i, i // {files_per_repo} AS r,
         ('0x' || substr(md5('{seed}:m:' || i), 1, 15))::BIGINT % {mmax} AS m
  FROM range(0, {n_files}) t(i)
  WHERE i % 29 <> 7
),
draws AS MATERIALIZED (
  SELECT f.r,
         ('0x' || substr(md5('{seed}:t:' || f.i || ':' || s.j), 1, 15))::BIGINT % {xmod} AS x
  FROM cf f CROSS JOIN range(0, {mmax}) s(j)
  WHERE s.j < f.m
),
e0 AS MATERIALIZED (
  SELECT DISTINCT r AS src, ({n_repos}::BIGINT * x * x) >> {shift} AS dst
  FROM draws WHERE (({n_repos}::BIGINT * x * x) >> {shift}) <> r
),
e AS MATERIALIZED (SELECT src, dst FROM e0 UNION SELECT dst AS src, src AS dst FROM e0),
v AS MATERIALIZED (SELECT i AS vid FROM range(0, {n_repos}) t(i))
"""


def corpus_pagerank_sql(
    supersteps: int = 6,
    n_repos: int = 200,
    files_per_repo: int = 4,
    mean_imports: int = 4,
    seed: int = 42,
    round_to: int = 9,
) -> str:
    """Reference PageRank unrolled over the hash-reproduced corpus edges;
    dense vid == repo number (fixed-width names, order-preserving ids), so
    the repo name is printf-reconstructed."""
    return pagerank_sql(
        supersteps=supersteps,
        round_to=round_to,
        edges_cte=corpus_edges_sql(n_repos, files_per_repo, mean_imports, seed),
        vertices_cte="",  # corpus_edges_sql already defines v (the dictionary)
        final_select=(
            "SELECT printf('repo_%06d', vid) AS repo, "
            "ROUND(CAST(rank AS DOUBLE), {round_to}) AS rank FROM r{last}"
        ),
    )


def corpus_wcc_sql(
    n_repos: int = 200,
    files_per_repo: int = 4,
    mean_imports: int = 4,
    seed: int = 42,
) -> str:
    """Min-id components over the hash-reproduced corpus edges; isolated
    repos are their own singleton component (vertex set = dictionary)."""
    return f"""
WITH RECURSIVE {corpus_edges_sql(n_repos, files_per_repo, mean_imports, seed)},
reach(vid, r) AS (
  SELECT vid, vid FROM v
  UNION
  SELECT reach.vid, e.dst FROM reach JOIN e ON reach.r = e.src
)
SELECT printf('repo_%06d', vid) AS repo, MIN(r) AS component
FROM reach GROUP BY vid
"""


def lpa_sql(supersteps: int = 10) -> str:
    """Unrolled delta-LPA with the engine's deterministic min-label
    tie-break (documented deviation from Lpa.java:98's Random)."""
    parts = [
        f"WITH {EDGES_CS}",
        "l0 AS MATERIALIZED (SELECT DISTINCT src AS vid, src AS label, TRUE AS changed FROM e)",
    ]
    for s in range(1, supersteps):
        p, c = s - 1, s
        parts.append(
            f"m{c} AS MATERIALIZED (SELECT e.dst, l.label FROM l{p} l "
            f"JOIN e ON l.vid = e.src WHERE l.changed)"
        )
        parts.append(
            f"v{c} AS MATERIALIZED (SELECT dst, label FROM ("
            f"SELECT dst, label, ROW_NUMBER() OVER ("
            f"PARTITION BY dst ORDER BY COUNT(*) DESC, label ASC) AS rn "
            f"FROM m{c} GROUP BY dst, label) WHERE rn = 1)"
        )
        parts.append(
            f"l{c} AS MATERIALIZED (SELECT l.vid, COALESCE(v.label, l.label) AS label, "
            f"COALESCE(v.label, l.label) <> l.label AS changed "
            f"FROM l{p} l LEFT JOIN v{c} v ON l.vid = v.dst)"
        )
    return ",\n".join(parts) + f"\nSELECT vid, label FROM l{supersteps - 1}"


def triangle_sql() -> str:
    # count(v) = |ordered (u,w): v~u, u~w, v~w| / 2 (TriangleCount.java:93-106)
    return f"""
WITH {EDGES_COPURCHASE},
t AS MATERIALIZED (
  SELECT e1.src AS vid, CAST(COUNT(*) / 2 AS BIGINT) AS triangles
  FROM e e1 JOIN e e2 ON e1.dst = e2.src
            JOIN e e3 ON e3.src = e1.src AND e3.dst = e2.dst
  GROUP BY e1.src
)
SELECT v.vid, COALESCE(t.triangles, 0) AS triangles
FROM (SELECT DISTINCT src AS vid FROM e) v LEFT JOIN t ON v.vid = t.vid
"""


def clustering_sql() -> str:
    return f"""
WITH {EDGES_COPURCHASE},
t AS MATERIALIZED (
  SELECT e1.src AS vid, CAST(COUNT(*) / 2 AS BIGINT) AS triangles
  FROM e e1 JOIN e e2 ON e1.dst = e2.src
            JOIN e e3 ON e3.src = e1.src AND e3.dst = e2.dst
  GROUP BY e1.src
),
d AS MATERIALIZED (SELECT src AS vid, COUNT(*) AS deg FROM e GROUP BY src)
SELECT d.vid,
       ROUND(CAST(CASE WHEN d.deg >= 2
             THEN 2.0 * COALESCE(t.triangles, 0) / (d.deg * (d.deg - 1))
             ELSE 0.0 END AS DOUBLE), 6) AS coefficient
FROM d LEFT JOIN t ON d.vid = t.vid
"""


# --------------------------------------------------------------- documents

def exact_dedup_sql() -> str:
    return """
SELECT md5(text) AS fingerprint, MIN(doc_id) AS keep_id,
       CAST(COUNT(*) AS BIGINT) AS dup_count
FROM documents GROUP BY md5(text)
"""


# DuckDB twin of operators.dedup.shingles (word 3-grams, distinct):
# Spark: transform(sequence(0, greatest(size-3, 0)), i -> concat_ws(' ',
# slice(toks, i+1, 3)));  both engines keep interior/trailing empty tokens
# from ' '-splits, so the shingle strings agree byte for byte.
def _shingles_sql(n: int = 3) -> str:
    return (
        "list_distinct(list_transform("
        f"range(1, GREATEST(len(t) - {n}, 0) + 2), "
        f"i -> array_to_string(list_slice(t, i, i + {n - 1}), ' ')))"
    )


def minhash_bands_sql(num_hashes: int = 16, band_size: int = 2, shingle_n: int = 3) -> str:
    """minhash_i(doc) = min over shingles of md5(shingle || '#i') — the
    md5-family is engine-portable; band_hash = md5 of '|'-joined band."""
    mh = ",\n  ".join(
        f"list_aggregate(list_transform(sh, s -> md5(s || '#{i}')), 'min') AS mh{i}"
        for i in range(num_hashes)
    )
    n_bands = num_hashes // band_size
    band_selects = []
    for b in range(n_bands):
        cols = " || '|' || ".join(
            f"mh{b * band_size + j}" for j in range(band_size)
        )
        band_selects.append(
            f"SELECT doc_id, CAST({b} AS BIGINT) AS band, md5({cols}) AS band_hash FROM sig"
        )
    return f"""
WITH toks AS MATERIALIZED (SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents),
sh AS MATERIALIZED (SELECT doc_id, {_shingles_sql(shingle_n)} AS sh FROM toks),
sig AS MATERIALIZED (SELECT doc_id,
  {mh}
FROM sh)
{" UNION ALL ".join(band_selects)}
"""


def minhash_lsh_pairs_sql(**kw) -> str:
    inner = minhash_bands_sql(**kw)
    return f"""
WITH b AS ({inner})
SELECT DISTINCT a.doc_id AS doc_a, c.doc_id AS doc_b
FROM b a JOIN b c ON a.band = c.band AND a.band_hash = c.band_hash
WHERE a.doc_id < c.doc_id
"""


def ngram_jaccard_sql(threshold: float = 0.3, shingle_n: int = 3, **kw) -> str:
    cand = minhash_lsh_pairs_sql(**kw)
    return f"""
WITH cand AS MATERIALIZED ({cand}),
toks AS MATERIALIZED (SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents),
sh AS MATERIALIZED (SELECT doc_id, {_shingles_sql(shingle_n)} AS sh FROM toks)
SELECT doc_a, doc_b,
       ROUND(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
             (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))), 6) AS jaccard
FROM cand JOIN sh a ON cand.doc_a = a.doc_id JOIN sh b ON cand.doc_b = b.doc_id
WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
      (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= {threshold!r}
"""


def dedup_clusters_sql(threshold: float = 0.3, shingle_n: int = 3, **kw) -> str:
    """Twin of operators.dedup.dedup_clusters: LSH candidates → Jaccard
    verify → transitive closure (recursive CTE ≡ the engine's WCC) →
    min-id survivor; docs without a verified pair keep themselves."""
    cand = minhash_lsh_pairs_sql(**kw)
    return f"""
WITH RECURSIVE cand AS MATERIALIZED ({cand}),
toks AS MATERIALIZED (SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents),
sh AS MATERIALIZED (SELECT doc_id, {_shingles_sql(shingle_n)} AS sh FROM toks),
vp AS MATERIALIZED (
  SELECT doc_a, doc_b FROM cand
  JOIN sh a ON cand.doc_a = a.doc_id JOIN sh b ON cand.doc_b = b.doc_id
  WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
        (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= {threshold!r}
),
e AS MATERIALIZED (
  SELECT doc_a AS src, doc_b AS dst FROM vp
  UNION SELECT doc_b AS src, doc_a AS dst FROM vp
),
reach(vid, r) AS (
  SELECT DISTINCT src, src FROM e
  UNION
  SELECT reach.vid, e.dst FROM reach JOIN e ON reach.r = e.src
),
comp AS MATERIALIZED (SELECT vid, MIN(r) AS keep FROM reach GROUP BY vid)
SELECT d.doc_id, COALESCE(c.keep, d.doc_id) AS keep_id
FROM documents d LEFT JOIN comp c ON d.doc_id = c.vid
"""


def simhash_near_pairs_sql(max_hamming: int = 3, bits: int = 60) -> str:
    """Twin of operators.dedup.simhash + simhash_near_pairs: token hash =
    60-bit hex(md5) prefix, per-bit ±1 majority vote, pigeonhole banding,
    exact Hamming filter. Spark's conv(substr(md5(t),1,15),16,10)::long ==
    DuckDB's ('0x'||substr(md5(t),1,15))::BIGINT (verified)."""
    votes = ",\n    ".join(
        f"SUM(CASE WHEN (h >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS v{b}"
        for b in range(bits)
    )
    sig = " + ".join(
        f"(CASE WHEN v{b} > 0 THEN {1 << b}::BIGINT ELSE 0::BIGINT END)"
        for b in range(bits)
    )
    n_bands = max_hamming + 1
    base = bits // n_bands
    spans = [
        (b * base, base if b < n_bands - 1 else bits - b * base)
        for b in range(n_bands)
    ]
    band_selects = " UNION ALL ".join(
        f"SELECT doc_id, simhash, {b}::BIGINT AS band, "
        f"(simhash >> {start}) & {(1 << width) - 1} AS key FROM sig"
        for b, (start, width) in enumerate(spans)
    )
    return f"""
WITH toks AS MATERIALIZED (
  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok FROM documents
),
hs AS MATERIALIZED (
  SELECT doc_id, ('0x' || substr(md5(tok), 1, 15))::BIGINT AS h FROM toks
),
bitsum AS MATERIALIZED (
  SELECT doc_id,
    {votes}
  FROM hs GROUP BY doc_id
),
sig AS MATERIALIZED (SELECT doc_id, {sig} AS simhash FROM bitsum),
bands AS MATERIALIZED ({band_selects})
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
       bit_count(xor(a.simhash, b.simhash))::BIGINT AS hamming
FROM bands a JOIN bands b ON a.band = b.band AND a.key = b.key
WHERE a.doc_id < b.doc_id
  AND bit_count(xor(a.simhash, b.simhash)) <= {max_hamming}
"""


def token_stats_sql() -> str:
    return """
WITH toks AS MATERIALIZED (
  SELECT doc_id, text, string_split(lower(text), ' ') AS t FROM documents
)
SELECT doc_id,
       CAST(len(t) AS BIGINT) AS n_tokens,
       CAST(length(text) AS BIGINT) AS n_chars,
       CAST(len(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                            x -> x <> '')) AS BIGINT) AS n_words,
       ROUND(CAST(list_sum(list_transform(t, x -> length(x))) AS DOUBLE)
             / GREATEST(len(t), 1), 6) AS avg_token_len
FROM toks
"""


_STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "with", "for", "it"],
    "es": ["el", "la", "de", "que", "y", "en", "los", "del", "se", "las"],
    "de": ["der", "die", "und", "das", "ist", "von", "mit", "den", "ein", "zu"],
    "fr": ["le", "la", "les", "des", "et", "est", "que", "dans", "une", "pour"],
}


def _sql_list(words: list[str]) -> str:
    return "[" + ", ".join(f"'{w}'" for w in words) + "]"


def quality_score_sql() -> str:
    all_stop = sorted(set(w for ws in _STOPWORDS.values() for w in ws))
    return f"""
WITH toks AS MATERIALIZED (
  SELECT doc_id, text, string_split(lower(text), ' ') AS t FROM documents
),
m AS MATERIALIZED (
  SELECT doc_id,
    CAST(length(regexp_replace(lower(text), '[^a-z]', '', 'g')) AS DOUBLE)
      / GREATEST(CAST(length(text) AS DOUBLE), 1.0) AS alpha_ratio,
    CAST(len(list_filter(t, x -> list_contains({_sql_list(all_stop)}, x))) AS DOUBLE)
      / GREATEST(len(t), 1) AS stop_ratio,
    CAST(len(list_distinct(t)) AS DOUBLE) / GREATEST(len(t), 1) AS uniq_ratio
  FROM toks
)
SELECT doc_id,
       ROUND(alpha_ratio, 6) AS alpha_ratio,
       ROUND(stop_ratio, 6) AS stopword_ratio,
       LEAST(1.0, ROUND(0.4 * alpha_ratio + 0.3 * LEAST(stop_ratio * 3, 1.0)
                        + 0.3 * uniq_ratio, 6)) AS quality
FROM m
"""


def lang_id_sql() -> str:
    hits = ",\n    ".join(
        f"CAST(len(list_filter(t, x -> list_contains({_sql_list(ws)}, x))) AS BIGINT) AS h_{lang}"
        for lang, ws in sorted(_STOPWORDS.items())
    )
    langs = sorted(_STOPWORDS)
    mx = "GREATEST(" + ", ".join(f"h_{lang}" for lang in langs) + ")"
    # alphabetical CASE order == the engine's min-lang tie-break
    case = " ".join(f"WHEN h_{lang} = mx THEN '{lang}'" for lang in langs)
    return f"""
WITH toks AS MATERIALIZED (SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents),
v AS MATERIALIZED (SELECT doc_id,
    {hits}
  FROM toks),
mm AS MATERIALIZED (SELECT *, {mx} AS mx FROM v)
SELECT doc_id, CASE WHEN mx = 0 THEN 'und' {case} END AS lang_guess
FROM mm
"""


def curation_filter_sql(min_quality: float = 0.5, langs: tuple[str, ...] = ("en",)) -> str:
    """Twin of operators.text.curation_filter: quality floor × accepted
    language × exact-dedup survivor (CTE bodies carry their own WITHs)."""
    lang_list = ", ".join(f"'{x}'" for x in langs)
    return f"""
WITH qs AS MATERIALIZED ({quality_score_sql()}),
li AS MATERIALIZED ({lang_id_sql()}),
kd AS MATERIALIZED (SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY md5(text))
SELECT d.doc_id, qs.quality, li.lang_guess
FROM documents d
JOIN qs ON d.doc_id = qs.doc_id
JOIN li ON d.doc_id = li.doc_id
JOIN kd ON d.doc_id = kd.doc_id
WHERE qs.quality >= {min_quality!r} AND li.lang_guess IN ({lang_list})
"""


def fingerprint_sql() -> str:
    return r"""
SELECT doc_id,
       md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) AS fp
FROM documents
"""


# ------------------------------------------------------------------ events

def sessionize_sql(gap_minutes: int = 30) -> str:
    """Twin of operators.events.sessionize: lag + running-sum session
    index over integer epoch-microseconds."""
    gap_us = gap_minutes * 60_000_000
    return f"""
WITH ev AS MATERIALIZED (
  SELECT user_id, epoch_us(ts) AS ts_us, event_id, value FROM events
),
tagged AS MATERIALIZED (
  SELECT user_id, ts_us, event_id, value,
    CASE WHEN ts_us - LAG(ts_us) OVER w > {gap_us} THEN 1 ELSE 0 END AS boundary
  FROM ev
  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
),
sess AS MATERIALIZED (
  SELECT user_id, ts_us, event_id, value,
    CAST(SUM(boundary) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
         ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
  FROM tagged
)
SELECT user_id, session_id,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       MIN(ts_us) AS start_us, MAX(ts_us) AS end_us,
       ROUND(SUM(value), 6) AS value_sum
FROM sess GROUP BY user_id, session_id
"""


def window_dedup_sql(window_minutes: int = 60) -> str:
    """Twin of operators.events.window_dedup: min-id survivor per
    (entity, event_type, tumbling window)."""
    window_us = window_minutes * 60_000_000
    return f"""
SELECT user_id, event_type,
       epoch_us(ts) // {window_us} AS win,
       MIN(event_id) AS keep_event_id,
       CAST(COUNT(*) - 1 AS BIGINT) AS n_dups
FROM events GROUP BY user_id, event_type, epoch_us(ts) // {window_us}
"""


# -------------------------------------------------------------- embeddings

_COS = (
    "ROUND(list_dot_product(q.qv, c.cv) / "
    "(sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(c.cv, c.cv))), 6)"
)


def cosine_topk_sql(k: int = 10, n_queries: int = 8) -> str:
    return f"""
WITH q AS MATERIALIZED (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
           FROM embeddings WHERE vec_id < {n_queries}),
c AS MATERIALIZED (SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS cv FROM embeddings),
s AS MATERIALIZED (
  SELECT q.query_id, c.neighbor_id, {_COS} AS score
  FROM c CROSS JOIN q WHERE c.neighbor_id <> q.query_id
)
SELECT query_id, neighbor_id, score FROM (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY query_id ORDER BY score DESC, neighbor_id ASC) AS rn
  FROM s
) WHERE rn <= {k}
"""


def _bucket_expr(vec: str, planes: list[list[float]]) -> str:
    bits = []
    for i, p in enumerate(planes):
        lit = "[" + ", ".join(repr(float(x)) for x in p) + "]"
        bits.append(
            f"(CASE WHEN list_dot_product({vec}, {lit}) >= 0 "
            f"THEN {1 << i} ELSE 0 END)"
        )
    return "CAST(" + " + ".join(bits) + " AS BIGINT)"


def ivf_topk_sql(
    plane_tables: list[list[list[float]]], k: int = 10, n_queries: int = 8
) -> str:
    """Multi-table LSH twin of operators.similarity.ivf_topk: per hash
    table, bucket = sign pattern against that table's literal hyperplanes
    (the exact floats the engine uses); candidates = DISTINCT union over
    tables, then exact cosine re-rank."""
    vec = "CAST(embedding AS DOUBLE[])"
    cands = " UNION ".join(
        f"SELECT q.query_id, q.qv, c.neighbor_id, c.cv "
        f"FROM c{t} c JOIN q{t} q USING (bucket) "
        f"WHERE c.neighbor_id <> q.query_id"
        for t in range(len(plane_tables))
    )
    per_table = ",\n".join(
        f"q{t} AS MATERIALIZED (SELECT vec_id AS query_id, {vec} AS qv, "
        f"{_bucket_expr(vec, planes)} AS bucket FROM embeddings WHERE vec_id < {n_queries}),\n"
        f"c{t} AS MATERIALIZED (SELECT vec_id AS neighbor_id, {vec} AS cv, "
        f"{_bucket_expr(vec, planes)} AS bucket FROM embeddings)"
        for t, planes in enumerate(plane_tables)
    )
    return f"""
WITH {per_table},
cand AS MATERIALIZED (SELECT DISTINCT query_id, qv, neighbor_id, cv FROM ({cands})),
s AS MATERIALIZED (
  SELECT query_id, neighbor_id, {_COS.replace('q.qv', 'qv').replace('c.cv', 'cv')} AS score
  FROM cand q
)
SELECT query_id, neighbor_id, score FROM (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY query_id ORDER BY score DESC, neighbor_id ASC) AS rn
  FROM s
) WHERE rn <= {k}
"""


# Nations sharing a region — small clique-per-region graph (symmetrized).
EDGES_NATION = """
e0 AS MATERIALIZED (
  SELECT CAST(a.n_nationkey AS BIGINT) AS src, CAST(b.n_nationkey AS BIGINT) AS dst
  FROM nation a JOIN nation b
    ON a.n_regionkey = b.n_regionkey AND a.n_nationkey < b.n_nationkey
),
e AS MATERIALIZED (SELECT src, dst FROM e0 UNION SELECT dst AS src, src AS dst FROM e0)
"""


def closeness_sql(n_sources: int = 32, max_depth: int = 19) -> str:
    """BFS closeness from the n smallest vertex ids on the customer-supplier
    graph: recursive reachability enumerates (start, vid, depth) rows up to
    max_depth (engine settles dist <= max_supersteps; both far exceed the
    graph diameter, so both sides reach the exact fixpoint);
    closeness(v) = ROUND(sum over starts of 1/min_depth, 6)."""
    return f"""
WITH RECURSIVE {EDGES_CS},
v AS MATERIALIZED (SELECT DISTINCT src AS vid FROM e),
srcs AS MATERIALIZED (SELECT vid FROM v ORDER BY vid LIMIT {n_sources}),
reach(start, vid, d) AS (
  SELECT vid, vid, 0 FROM srcs
  UNION
  SELECT reach.start, e.dst, reach.d + 1
  FROM reach JOIN e ON reach.vid = e.src WHERE reach.d < {max_depth}
),
md AS MATERIALIZED (
  SELECT start, vid, MIN(d) AS d FROM reach WHERE vid <> start GROUP BY start, vid
),
cc AS MATERIALIZED (
  SELECT vid, ROUND(SUM(1.0 / d), 6) AS closeness FROM md GROUP BY vid
)
SELECT v.vid, COALESCE(cc.closeness, 0.0) AS closeness
FROM v LEFT JOIN cc ON v.vid = cc.vid
"""


def closeness_weighted_sql(
    n_sources: int = 16, max_supersteps: int = 8, round_to: int = 6
) -> str:
    """Weighted closeness twin: Bellman-Ford unrolled hop by hop over the
    weighted customer–supplier edges, mirroring the engine's superstep
    recursion EXACTLY (seed = 1-hop distances, then max_supersteps-1
    relax rounds), so even if neither side has reached the unbounded
    fixpoint both compute the identical ≤max_supersteps-hop distances —
    every path's weight sum accumulates start→end in the same order on
    both engines. Skips messages INTO the start (ClosenessCentrality
    sendMessage skips the origin); closeness = Σ 1/d."""
    parts = [
        f"""WITH w0 AS MATERIALIZED (
  SELECT CAST(o_custkey AS BIGINT) AS src,
         CAST({SUPPLIER_OFFSET} + l_suppkey AS BIGINT) AS dst,
         CAST(SUM(l_quantity) AS DOUBLE) AS weight
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  GROUP BY 1, 2
),
w AS MATERIALIZED (
  SELECT src, dst, MAX(weight) AS weight FROM (
    SELECT src, dst, weight FROM w0
    UNION ALL SELECT dst AS src, src AS dst, weight FROM w0
  ) GROUP BY src, dst
),
v AS MATERIALIZED (SELECT DISTINCT src AS vid FROM w),
srcs AS MATERIALIZED (SELECT vid FROM v ORDER BY vid LIMIT {n_sources})""",
        "d1 AS MATERIALIZED (SELECT s.vid AS start, w.dst AS vid, MIN(w.weight) AS d "
        "FROM srcs s JOIN w ON w.src = s.vid WHERE w.dst <> s.vid GROUP BY 1, 2)",
    ]
    for i in range(2, max_supersteps + 1):
        p = i - 1
        parts.append(
            f"d{i} AS MATERIALIZED (SELECT start, vid, MIN(d) AS d FROM ("
            f"SELECT start, vid, d FROM d{p} "
            f"UNION ALL "
            f"SELECT p.start, w.dst AS vid, p.d + w.weight AS d "
            f"FROM d{p} p JOIN w ON w.src = p.vid WHERE w.dst <> p.start"
            f") GROUP BY start, vid)"
        )
    last = max_supersteps
    parts.append(
        f"cc AS MATERIALIZED (SELECT vid, ROUND(SUM(1.0 / d), {round_to}) AS closeness "
        f"FROM d{last} GROUP BY vid)"
    )
    return (
        ",\n".join(parts)
        + """
SELECT v.vid, COALESCE(cc.closeness, 0.0) AS closeness
FROM v LEFT JOIN cc ON v.vid = cc.vid
"""
    )


def rings_count_sql() -> str:
    """Reference-exact ring counts on the nation clique graph: recursive
    path flood (root = seq[1]; forward to neighbors >= root, no revisits;
    ring recorded at its minimum vertex — RingsDetection.java:32-116)."""
    return f"""
WITH RECURSIVE {EDGES_NATION},
p(cur, seq) AS (
  SELECT dst AS cur, [src] AS seq FROM e WHERE dst >= src
  UNION ALL
  SELECT e.dst, list_append(p.seq, p.cur)
  FROM p JOIN e ON p.cur = e.src
  WHERE p.cur <> p.seq[1] AND NOT list_contains(p.seq, p.cur)
    AND e.dst >= p.seq[1]
),
r AS MATERIALIZED (
  SELECT seq[1] AS vid FROM p WHERE cur = seq[1] AND cur <= list_min(seq)
),
counts AS MATERIALIZED (
  SELECT vid, CAST(COUNT(*) AS BIGINT) AS n_rings FROM r GROUP BY vid
)
SELECT v.vid, COALESCE(c.n_rings, 0) AS n_rings
FROM (SELECT DISTINCT src AS vid FROM e) v LEFT JOIN counts c ON v.vid = c.vid
"""


def links_sql() -> str:
    """Links traversal twin (Links.java:30-130 minus the JSON DSL): start
    at clique-min nations (vid < 5), spread along increasing edges
    (dst > src), end on arrival at vid >= 15; paths recorded where they
    end. Monotone spread makes the flood finite on the clique graph."""
    return f"""
WITH RECURSIVE {EDGES_NATION},
p(cur, path, ended) AS (
  SELECT vid, [vid], vid >= 15
  FROM (SELECT DISTINCT src AS vid FROM e) WHERE vid < 5
  UNION ALL
  SELECT e.dst, list_append(p.path, e.dst), e.dst >= 15
  FROM p JOIN e ON p.cur = e.src
  WHERE NOT p.ended AND e.dst > e.src
)
SELECT cur AS vid, array_to_string(path, '-') AS path_str FROM p WHERE ended
"""


EDGES_NATION_LABELED = """e0 AS MATERIALIZED (
  SELECT CAST(a.n_nationkey AS BIGINT) AS src, CAST(b.n_nationkey AS BIGINT) AS dst
  FROM nation a JOIN nation b
    ON a.n_regionkey = b.n_regionkey AND a.n_nationkey < b.n_nationkey
),
e AS MATERIALIZED (
  SELECT src, dst,
         CAST((src + dst) % 7 AS DOUBLE) AS weight,
         CASE WHEN (src + dst) % 3 = 0 THEN 'know' ELSE 'pay' END AS label
  FROM (SELECT src, dst FROM e0 UNION ALL SELECT dst AS src, src AS dst FROM e0)
)"""


def rings_filter_dsl_sql() -> str:
    """RingsDetectionWithFilter twin with the gate's JSON describe
    hand-compiled to SQL (the Spark side compiles the SAME describe via
    path_filter.aviator_to_sql — this oracle is the independent
    derivation): vertex filter 'user': $element.weight < 2 (weight =
    nationkey % 3); edge filter 'pay': $message.weight <= $element.weight
    (non-'pay' edges pass; superstep 0 strips the $message expression so
    ALL edges from allowed vertices spread). No dst >= root pruning —
    the filtered variant floods every passing edge
    (RingsDetectionWithFilter.java:63-70, 108-114); the walk carries the
    previous edge's weight (message.walkEdgeProp)."""
    return f"""
WITH RECURSIVE {EDGES_NATION_LABELED},
a AS MATERIALIZED (
  SELECT CAST(n_nationkey AS BIGINT) AS vid FROM nation WHERE n_nationkey % 3 < 2
),
p(cur, seq, inw) AS (
  SELECT e.dst, [e.src], e.weight FROM e JOIN a ON e.src = a.vid
  UNION ALL
  SELECT e.dst, list_append(p.seq, p.cur), e.weight
  FROM p JOIN a ON p.cur = a.vid JOIN e ON p.cur = e.src
  WHERE p.cur <> p.seq[1] AND NOT list_contains(p.seq, p.cur)
    AND (e.label <> 'pay' OR p.inw <= e.weight)
)
SELECT p.seq[1] AS vid, array_to_string(list_append(p.seq, p.cur), '-') AS ring_str
FROM p JOIN a ON p.cur = a.vid
WHERE p.cur = p.seq[1] AND p.cur <= list_min(p.seq)
"""


def links_filter_dsl_sql() -> str:
    """Links twin for the gate's ``links.analyze_config`` describe
    (mirrors the reference's own test shape, LinksTest.java:119-138):
    start vertexes 0-4; edge_end_condition pay: double($out.weight) >= 5;
    edge_compare_condition pay: $out.weight > $in.weight. First hop
    spreads on the label check ALONE (isEdgeCanSpread0:120-122 —
    ``p.inw IS NULL`` marks it); an end edge records at the CURRENT
    vertex with the target appended and never spreads."""
    return f"""
WITH RECURSIVE {EDGES_NATION_LABELED},
starts AS MATERIALIZED (
  SELECT CAST(n_nationkey AS BIGINT) AS vid FROM nation WHERE n_nationkey < 5
),
p(cur, path, inw) AS (
  SELECT vid, [vid], CAST(NULL AS DOUBLE) FROM starts
  UNION ALL
  SELECT e.dst, list_append(p.path, e.dst), CAST(e.weight AS DOUBLE)
  FROM p JOIN e ON p.cur = e.src
  WHERE NOT (e.label = 'pay' AND CAST(e.weight AS DOUBLE) >= 5)
    AND e.label = 'pay'
    AND (p.inw IS NULL OR e.weight > p.inw)
)
SELECT p.cur AS vid, array_to_string(list_append(p.path, e.dst), '-') AS path_str
FROM p JOIN e ON p.cur = e.src
WHERE e.label = 'pay' AND CAST(e.weight AS DOUBLE) >= 5
"""


def rings_filter_builtins_sql() -> str:
    """Twin of the ``rings_filter_builtins`` gate — the describe's
    Aviator builtins hand-derived to INDEPENDENT DuckDB SQL (the Spark
    side compiles them via path_filter._FNS templates; this oracle uses
    different formulations on purpose):

    * vertex 'user': ``$element.name != nil && string.startsWith(
      $element.name, 'user_') && math.min($element.weight, 2) < 2`` —
      name is NULL iff nationkey%4==0 and always starts with 'user_'
      otherwise, weight = nationkey%3, so membership reduces to
      ``n%4 <> 0 AND n%3 < 2``.
    * edge 'pay': ``string.contains(str(long($element.weight)), '3') ==
      false && $message.weight <= math.max($element.weight, 1)`` —
      derived here as ``INSTR(...) = 0`` (vs the compiler's
      ``(INSTR(...) > 0) = FALSE``). Superstep 0 strips the whole
      expression ($message in flight — SpreadFilter.filter(Edge):84-99).
    """
    return f"""
WITH RECURSIVE {EDGES_NATION_LABELED},
a AS MATERIALIZED (
  SELECT CAST(n_nationkey AS BIGINT) AS vid FROM nation
  WHERE n_nationkey % 4 <> 0 AND n_nationkey % 3 < 2
),
p(cur, seq, inw) AS (
  SELECT e.dst, [e.src], e.weight FROM e JOIN a ON e.src = a.vid
  UNION ALL
  SELECT e.dst, list_append(p.seq, p.cur), e.weight
  FROM p JOIN a ON p.cur = a.vid JOIN e ON p.cur = e.src
  WHERE p.cur <> p.seq[1] AND NOT list_contains(p.seq, p.cur)
    AND (e.label <> 'pay' OR (
      INSTR(CAST(CAST(e.weight AS BIGINT) AS VARCHAR), '3') = 0
      AND p.inw <= GREATEST(e.weight, 1.0)
    ))
)
SELECT p.seq[1] AS vid, array_to_string(list_append(p.seq, p.cur), '-') AS ring_str
FROM p JOIN a ON p.cur = a.vid
WHERE p.cur = p.seq[1] AND p.cur <= list_min(p.seq)
"""


def rings_filter_seq_sql() -> str:
    """Twin of the ``rings_filter_seq`` gate — the describe's seq-library
    and ``=~`` predicates hand-derived to INDEPENDENT DuckDB SQL:

    * vertex 'user': ``include(seq.set(0, 1), long($element.weight)) &&
      $element.name =~ /user_[0-3]/`` — weight = n%3 so membership is
      ``n%3 < 2``; name is NULL iff n%4==0 (regex on NULL is not a
      match) and 'user_<n%5>' otherwise, so the anchored full match is
      ``n%4 <> 0 AND n%5 <= 3``.
    * edge 'pay': ``count(seq.list(1,2,3)) == 3 && !include(
      seq.list(3.0, 5.0), $element.weight)`` — count is identically 3;
      membership derived here as a ``<>`` chain (vs the compiler's
      ``NOT (w IN (...))``). No $message reference, so the filter also
      gates the first hop.
    """
    return f"""
WITH RECURSIVE {EDGES_NATION_LABELED},
a AS MATERIALIZED (
  SELECT CAST(n_nationkey AS BIGINT) AS vid FROM nation
  WHERE n_nationkey % 3 < 2 AND n_nationkey % 4 <> 0 AND n_nationkey % 5 <= 3
),
p(cur, seq) AS (
  SELECT e.dst, [e.src] FROM e JOIN a ON e.src = a.vid
  WHERE e.label <> 'pay' OR (e.weight <> 3.0 AND e.weight <> 5.0)
  UNION ALL
  SELECT e.dst, list_append(p.seq, p.cur)
  FROM p JOIN a ON p.cur = a.vid JOIN e ON p.cur = e.src
  WHERE p.cur <> p.seq[1] AND NOT list_contains(p.seq, p.cur)
    AND (e.label <> 'pay' OR (e.weight <> 3.0 AND e.weight <> 5.0))
)
SELECT p.seq[1] AS vid, array_to_string(list_append(p.seq, p.cur), '-') AS ring_str
FROM p JOIN a ON p.cur = a.vid
WHERE p.cur = p.seq[1] AND p.cur <= list_min(p.seq)
"""


def betweenness_sql(
    n_sources: int = 16, max_depth: int = 12, round_to: int = 6
) -> str:
    """Deterministic sampled Brandes unrolled level by level — the SQL
    twin of operators.betweenness (same documented deviation from the
    reference's randomized flood): forward BFS layers carry path counts
    sigma; the backward sweep computes
    delta(v) = Σ_w sigma_v/sigma_w · (1+delta_w) per level; betweenness =
    Σ deltas / 2. The caller MUST pass the same ``max_depth`` the engine
    runs with (__spark_entry__ pins both to BETWEENNESS_DEPTH — ADVICE r2:
    a hardcoded 6 would silently truncate sigma/delta at a scale factor
    whose eccentricity exceeds it). If the deepest unrolled level is
    still non-empty (possible truncation), the query emits a sentinel
    row (vid = -1) so the gate fails LOUDLY on rows/hash instead of
    comparing silently truncated values."""
    parts = [
        f"WITH {EDGES_CS}",
        "v AS MATERIALIZED (SELECT DISTINCT src AS vid FROM e)",
        f"srcs AS MATERIALIZED (SELECT vid FROM v ORDER BY vid LIMIT {n_sources})",
        "l0 AS MATERIALIZED (SELECT vid AS source, vid, CAST(1.0 AS DOUBLE) AS sigma FROM srcs)",
        "seen0 AS MATERIALIZED (SELECT source, vid FROM l0)",
    ]
    for d in range(1, max_depth + 1):
        p = d - 1
        parts.append(
            f"l{d} AS MATERIALIZED (SELECT l.source, e.dst AS vid, SUM(l.sigma) AS sigma "
            f"FROM l{p} l JOIN e ON l.vid = e.src "
            f"LEFT JOIN seen{p} s ON s.source = l.source AND s.vid = e.dst "
            f"WHERE s.vid IS NULL GROUP BY l.source, e.dst)"
        )
        parts.append(
            f"seen{d} AS MATERIALIZED (SELECT * FROM seen{p} "
            f"UNION ALL SELECT source, vid FROM l{d})"
        )
    # backward sweep: delta at the deepest layer is 0
    parts.append(
        f"x{max_depth} AS MATERIALIZED "
        f"(SELECT source, vid, CAST(0.0 AS DOUBLE) AS delta FROM l{max_depth})"
    )
    for d in range(max_depth - 1, 0, -1):
        parts.append(
            f"x{d} AS MATERIALIZED (SELECT u.source, u.vid, "
            f"SUM(u.sigma / w.sigma * (1 + COALESCE(dw.delta, 0.0))) AS delta "
            f"FROM l{d} u JOIN e ON u.vid = e.src "
            f"JOIN l{d + 1} w ON w.source = u.source AND w.vid = e.dst "
            f"LEFT JOIN x{d + 1} dw ON dw.source = w.source AND dw.vid = w.vid "
            f"GROUP BY u.source, u.vid)"
        )
    allx = " UNION ALL ".join(
        f"SELECT vid, delta FROM x{d}" for d in range(1, max_depth)
    )
    parts.append(f"acc AS MATERIALIZED (SELECT vid, SUM(delta) AS c FROM ({allx}) GROUP BY vid)")
    return (
        ",\n".join(parts)
        + f"""
SELECT v.vid, ROUND(COALESCE(acc.c, 0.0) / 2.0, {round_to}) AS betweenness
FROM v LEFT JOIN acc ON v.vid = acc.vid
UNION ALL
SELECT -1 AS vid, -1.0 AS betweenness
WHERE EXISTS (SELECT 1 FROM l{max_depth})
"""
    )


def coreness_sql(iterations: int = 64) -> str:
    """Exact k-core via the h-index fixpoint (Lü et al. 2016), unrolled —
    the SQL twin of operators.kcore: h0 = degree; h_{t+1}(v) =
    min(h_t(v), H({h_t(u): u∈N(v)})) where the h-index is
    MAX(LEAST(value, desc-rank)). Monotone non-increasing, so any
    iteration count ≥ the convergence round yields the exact coreness.
    Default 64: the sf0.01 co-purchase graph converges in ~6 rounds but
    sf0.1 needs >30 and <60 (measured — 30 left 15,299/20,000 vertices
    one-off-high; 60 == 90 bit-identical), so 64 keeps the oracle valid
    at every SF the gate runs while costing only ~2× the 30-round SQL."""
    parts = [
        f"WITH {EDGES_COPURCHASE}",
        "v AS MATERIALIZED (SELECT DISTINCT src AS vid FROM e)",
        "dg AS MATERIALIZED (SELECT src AS vid, CAST(COUNT(*) AS BIGINT) AS h FROM e GROUP BY src)",
        "h0 AS MATERIALIZED (SELECT v.vid, COALESCE(dg.h, 0) AS h FROM v LEFT JOIN dg ON v.vid = dg.vid)",
    ]
    for t in range(1, iterations + 1):
        p = t - 1
        parts.append(
            f"h{t} AS MATERIALIZED (SELECT s.vid, LEAST(s.h, COALESCE(c.cand, s.h)) AS h "
            f"FROM h{p} s LEFT JOIN ("
            f"SELECT vid, MAX(LEAST(nh, rn)) AS cand FROM ("
            f"SELECT e.dst AS vid, p.h AS nh, "
            f"ROW_NUMBER() OVER (PARTITION BY e.dst ORDER BY p.h DESC) AS rn "
            f"FROM e JOIN h{p} p ON p.vid = e.src"
            f") GROUP BY vid) c ON s.vid = c.vid)"
        )
    return ",\n".join(parts) + f"\nSELECT vid, h AS coreness FROM h{iterations}"


def betweenness_tree_sql() -> str:
    """Exact betweenness on the supplier—nation—region forest via the tree
    closed form: for v in a tree of size t whose removal leaves components
    of sizes c_i, betweenness(v) = ((t-1)^2 - Σ c_i^2) / 2 — identical to
    deterministic Brandes with the undirected halving (unique shortest
    paths in a tree)."""
    return """
WITH sn AS MATERIALIZED (
  SELECT CAST(200 + s_suppkey AS BIGINT) AS vid,
         CAST(s_nationkey AS BIGINT) AS nat
  FROM supplier
),
scount AS MATERIALIZED (SELECT nat, CAST(COUNT(*) AS BIGINT) AS s_v FROM sn GROUP BY nat),
nt AS MATERIALIZED (
  SELECT CAST(n_nationkey AS BIGINT) AS vid,
         CAST(100 + n_regionkey AS BIGINT) AS reg,
         COALESCE(s.s_v, 0) AS s_v
  FROM nation LEFT JOIN scount s ON CAST(n_nationkey AS BIGINT) = s.nat
),
rsz AS MATERIALIZED (
  SELECT reg, CAST(1 + COUNT(*) + SUM(s_v) AS BIGINT) AS t,
         SUM((1 + s_v) * (1 + s_v)) AS sq
  FROM nt GROUP BY reg
)
SELECT sn.vid, 0.0 AS betweenness FROM sn
UNION ALL
SELECT nt.vid,
       ROUND(((r.t - 1) * (r.t - 1) - (nt.s_v + (r.t - 1 - nt.s_v) * (r.t - 1 - nt.s_v)))
             / 2.0, 6) AS betweenness
FROM nt JOIN rsz r ON nt.reg = r.reg
UNION ALL
SELECT r.reg AS vid,
       ROUND(((r.t - 1) * (r.t - 1) - r.sq) / 2.0, 6) AS betweenness
FROM rsz r
"""


def embedding_near_dup_sql(
    plane_tables: list[list[list[float]]], threshold: float = 0.8
) -> str:
    """Multi-table LSH-bucketed embedding near-dup pairs with exact
    cosine filter — literal hyperplanes shared with the engine; candidate
    pairs deduped across tables before scoring."""
    vec = "CAST(embedding AS DOUBLE[])"
    per_table = ",\n".join(
        f"v{t} AS MATERIALIZED (SELECT vec_id, {vec} AS vec, "
        f"{_bucket_expr(vec, planes)} AS bucket FROM embeddings)"
        for t, planes in enumerate(plane_tables)
    )
    cands = " UNION ".join(
        f"SELECT a.vec_id AS id_a, b.vec_id AS id_b, a.vec AS va, b.vec AS vb "
        f"FROM v{t} a JOIN v{t} b ON a.bucket = b.bucket AND a.vec_id < b.vec_id"
        for t in range(len(plane_tables))
    )
    return f"""
WITH {per_table},
cand AS MATERIALIZED (SELECT DISTINCT id_a, id_b, va, vb FROM ({cands}))
SELECT id_a, id_b,
       ROUND(list_dot_product(va, vb) /
             (sqrt(list_dot_product(va, va)) *
              sqrt(list_dot_product(vb, vb))), 6) AS score
FROM cand
WHERE list_dot_product(va, vb) /
      (sqrt(list_dot_product(va, va)) *
       sqrt(list_dot_product(vb, vb))) >= {threshold!r}
"""


def multimodal_features_sql(n: int = 64, seed: int = 42, dim: int = 16) -> str:
    """SQL twin of multimodal.synth_assets + extract_features (fake
    decoder): payload = sha256(f"{seed}:{i}") digest repeated 8 times, so
    payload.hex() == repeat(sha256_hex, 8); feature component j =
    (md5-60-bit(payload_hex ':' j) % 1e6) / 1e6 — the same portable hash
    family as simhash/corpus (operators/dedup.py SIMHASH_BITS). The gate
    signature hashes the INTEGER micro-values, so no float formatting is
    involved and the mapInPandas/Arrow path is value-hash-checked."""
    return f"""
WITH payload AS MATERIALIZED (
  SELECT i AS asset_id, repeat(sha256('{seed}:' || i), 8) AS hexp
  FROM range(0, {n}) t(i)
),
comp AS MATERIALIZED (
  SELECT asset_id, j,
         ('0x' || substr(md5(hexp || ':' || j), 1, 15))::BIGINT % 1000000 AS micro
  FROM payload CROSS JOIN range(0, {dim}) s(j)
)
SELECT asset_id,
       md5(string_agg(micro::VARCHAR, ',' ORDER BY j)) AS feature_sig,
       {dim}::BIGINT AS dim
FROM comp GROUP BY asset_id
"""


def multimodal_real_decode_sql(n: int = 48, seed: int = 7) -> str:
    """Twin of multimodal.synth_real_assets + decode_stats: the Spark
    side PARSES actual PPM/WAV containers (header, comments, chunk walk)
    with the pure-numpy decoders; this oracle re-derives the decoded
    values from the generator formula — pixel/sample bytes are sha256
    digest chains of ``"{seed}:{i}:{block}"``, images are 192 raw bytes
    (values 0-255), audio is 64 little-endian int16 samples (pairs
    ``b0 + 256·b1``, two's complement). A single mis-parsed byte
    anywhere (comment handling, chunk alignment, endianness) shifts
    sum/sumsq and fails the hash."""
    return f"""
WITH bytes AS MATERIALIZED (
  SELECT i AS asset_id,
         CASE WHEN i % 2 = 0 THEN 'image' ELSE 'audio' END AS modality,
         j,
         ('0x' || substr(sha256('{seed}:' || i || ':' || (j // 32)),
                         (j % 32) * 2 + 1, 2))::BIGINT AS b
  FROM range(0, {n}) t(i) CROSS JOIN range(0, 192) s(j)
  WHERE i % 2 = 0 OR j < 128
),
image_vals AS MATERIALIZED (
  SELECT asset_id, modality, b AS v FROM bytes WHERE modality = 'image'
),
audio_raw AS MATERIALIZED (
  SELECT asset_id, modality, j // 2 AS k,
         SUM(CASE WHEN j % 2 = 0 THEN b ELSE 256 * b END) AS raw
  FROM bytes WHERE modality = 'audio' GROUP BY asset_id, modality, j // 2
),
vals AS MATERIALIZED (
  SELECT asset_id, modality, v FROM image_vals
  UNION ALL
  SELECT asset_id, modality,
         CASE WHEN raw >= 32768 THEN raw - 65536 ELSE raw END AS v
  FROM audio_raw
)
SELECT asset_id, modality,
       COUNT(*)::BIGINT AS n_vals,
       CAST(SUM(v) AS BIGINT) AS sum_val,
       CAST(SUM(v * v) AS BIGINT) AS sumsq,
       ROUND(CAST(SUM(v) AS DOUBLE) / COUNT(*), 6) AS mean_val
FROM vals GROUP BY asset_id, modality
"""


def multimodal_png_sql(
    n: int = 32, seed: int = 13, w: int = 16, h: int = 16
) -> str:
    """Twin of multimodal.synth_png_assets + decode_stats: the Spark side
    walks the PNG chunk framing (skipping the ancillary tEXt), inflates
    the zlib IDAT stream, and inverts the per-scanline filter (type
    y % 5 — all five RFC 2083 filters appear); this oracle re-derives the
    RAW raster bytes from the generator's sha256 chain, so any defect in
    inflate or any unfilter branch shifts sum/sumsq and fails the hash."""
    total = w * h * 3
    return f"""
WITH bytes AS MATERIALIZED (
  SELECT i AS asset_id, 'image' AS modality,
         ('0x' || substr(sha256('{seed}:' || i || ':' || (j // 32)),
                         (j % 32) * 2 + 1, 2))::BIGINT AS b
  FROM range(0, {n}) t(i) CROSS JOIN range(0, {total}) s(j)
)
SELECT asset_id, modality,
       COUNT(*)::BIGINT AS n_vals,
       CAST(SUM(b) AS BIGINT) AS sum_val,
       CAST(SUM(b * b) AS BIGINT) AS sumsq,
       ROUND(CAST(SUM(b) AS DOUBLE) / COUNT(*), 6) AS mean_val
FROM bytes GROUP BY asset_id, modality
"""


def multimodal_resize_sql(
    n: int = 48, seed: int = 7, out_w: int = 4, out_h: int = 4
) -> str:
    """Twin of multimodal.synth_real_assets + resize_images: the Spark
    side parses each 8x8 P6 container and nearest-neighbor-resamples it
    with the half-pixel-center map src = ((2*dst+1)*8) // (2*out_dim);
    this oracle re-derives the SAME sampled pixel bytes directly from
    the sha256 digest-chain generator — pixel (y, x, c) lives at raster
    offset o = y*24 + x*3 + c, byte = sha256('{seed}:{i}:{o//32}')[o%32].
    A wrong index map (off-by-one, floor vs round, row/col swap) picks
    different bytes and fails the value hash."""
    return f"""
WITH sampled AS MATERIALIZED (
  SELECT i AS asset_id,
         (((2 * yd + 1) * 8) // (2 * {out_h})) * 24
       + (((2 * xd + 1) * 8) // (2 * {out_w})) * 3 + c AS o
  FROM range(0, {n}) t(i)
       CROSS JOIN range(0, {out_h}) a(yd)
       CROSS JOIN range(0, {out_w}) b(xd)
       CROSS JOIN range(0, 3) cc(c)
  WHERE i % 2 = 0
),
vals AS MATERIALIZED (
  SELECT asset_id,
         ('0x' || substr(sha256('{seed}:' || asset_id || ':' || (o // 32)),
                         (o % 32) * 2 + 1, 2))::BIGINT AS v
  FROM sampled
)
SELECT asset_id,
       {out_w}::BIGINT AS out_w,
       {out_h}::BIGINT AS out_h,
       COUNT(*)::BIGINT AS n_vals,
       CAST(SUM(v) AS BIGINT) AS sum_val,
       CAST(SUM(v * v) AS BIGINT) AS sumsq,
       ROUND(CAST(SUM(v) AS DOUBLE) / COUNT(*), 6) AS mean_val
FROM vals GROUP BY asset_id
"""


def multimodal_frame_sample_sql(
    n: int = 24,
    seed: int = 11,
    w: int = 8,
    h: int = 4,
    n_frames: int = 24,
    every_n: int = 5,
) -> str:
    """Twin of multimodal.synth_video_assets + frame_sample_decode: the
    Spark side walks a REAL concatenated-P6 stream (per-frame header
    comments make frame offsets data-dependent, so it must parse every
    header to seek), decodes only frames 0, every_n, 2·every_n, … and
    emits exact pixel statistics; this oracle re-derives the sampled
    frames' raster bytes straight from the generator — byte j of frame
    f of asset i is sha256('{seed}:{i}:{f}:{j//32}')[j%32]. A wrong
    seek (comment mishandled, off-by-one frame index, raster length
    miscomputed) lands on different bytes and fails the value hash."""
    raster = w * h * 3
    return f"""
WITH vals AS MATERIALIZED (
  SELECT i AS asset_id, f AS frame_index,
         ('0x' || substr(sha256('{seed}:' || i || ':' || f || ':' || (j // 32)),
                         (j % 32) * 2 + 1, 2))::BIGINT AS v
  FROM range(0, {n}) t(i)
       CROSS JOIN range(0, {n_frames}, {every_n}) fr(f)
       CROSS JOIN range(0, {raster}) s(j)
)
SELECT asset_id,
       frame_index::BIGINT AS frame_index,
       COUNT(*)::BIGINT AS n_vals,
       CAST(SUM(v) AS BIGINT) AS sum_val,
       CAST(SUM(v * v) AS BIGINT) AS sumsq,
       ROUND(CAST(SUM(v) AS DOUBLE) / COUNT(*), 6) AS mean_val
FROM vals GROUP BY asset_id, frame_index
"""


def stratified_sample_sql(rates: dict[str, float], salt: str = "sample") -> str:
    """Twin of sampling.deterministic_sample over documents: the keep
    gate is the portable 60-bit md5 draw, so both engines select the
    IDENTICAL id set — a different hash slice, modulus, or rate
    rounding changes membership and fails the hash."""
    mod = 1_000_000
    clauses = " OR ".join(
        f"(lang = '{s}' AND draw < {int(round(r * mod))})"
        for s, r in sorted(rates.items())
    )
    return f"""
WITH d AS MATERIALIZED (
  SELECT doc_id, lang,
         ('0x' || substr(md5('{salt}:' || doc_id), 1, 15))::BIGINT % {mod} AS draw
  FROM documents
)
SELECT doc_id, lang, draw FROM d WHERE {clauses}
"""


def shard_stats_sql(n_shards: int, salt: str = "shard") -> str:
    """Twin of sampling.shard_assign rolled up per shard: (shard,
    n_docs, sum_doc_id) hash-checks the COMPLETE assignment compactly —
    one misrouted document shifts two shards' sums."""
    mod = 1_000_000
    return f"""
WITH d AS MATERIALIZED (
  SELECT doc_id,
         (('0x' || substr(md5('{salt}:' || doc_id), 1, 15))::BIGINT % {mod})
           % {n_shards} AS shard
  FROM documents
)
SELECT shard::BIGINT AS shard,
       COUNT(*)::BIGINT AS n_docs,
       CAST(SUM(doc_id) AS BIGINT) AS sum_doc_id
FROM d GROUP BY shard
"""


def edge_props_policy_sql() -> str:
    """SQL twin of Graph.from_edges' properties-combiner policies over
    sources.lineitem_ordered_prop_edges: per (src,dst) after symmetrize,
    merge_new = qty at the FIRST non-null ingest rank (combine(old,new)
    keeps old — MergeNewPropertiesCombiner.java), merge_old = qty at the
    LAST non-null rank (MergeOldPropertiesCombiner.java), overwrite = the
    last duplicate's qty nulls included (OverwriteCombiner), min = the
    engine's orderless default. ord is the portable 60-bit md5 of the
    full row key (unique per row — the testdata repeats (orderkey,
    linenumber)), so first/last are well-defined in both engines."""
    return """
WITH raw AS MATERIALIZED (
  SELECT (l_partkey % 50)::BIGINT AS src,
         (100 + l_suppkey % 50)::BIGINT AS dst,
         ('0x' || substr(md5(l_orderkey || ':' || l_linenumber || ':' ||
                             l_partkey || ':' || l_suppkey), 1, 15))::BIGINT AS ord,
         CASE WHEN l_quantity % 10 <> 0 THEN l_quantity::DOUBLE END AS qty
  FROM lineitem
),
sym AS MATERIALIZED (
  SELECT src, dst, ord, qty FROM raw
  UNION ALL SELECT dst AS src, src AS dst, ord, qty FROM raw
),
base AS MATERIALIZED (SELECT DISTINCT src, dst FROM sym),
nn AS MATERIALIZED (
  SELECT src, dst, MIN(ord) AS fo, MAX(ord) AS lo
  FROM sym WHERE qty IS NOT NULL GROUP BY src, dst
),
lastrow AS MATERIALIZED (SELECT src, dst, MAX(ord) AS mo FROM sym GROUP BY src, dst),
mn AS MATERIALIZED (
  SELECT n.src, n.dst, r.qty FROM nn n
  JOIN sym r ON r.src = n.src AND r.dst = n.dst AND r.ord = n.fo
),
mo AS MATERIALIZED (
  SELECT n.src, n.dst, r.qty FROM nn n
  JOIN sym r ON r.src = n.src AND r.dst = n.dst AND r.ord = n.lo
),
ov AS MATERIALIZED (
  SELECT l.src, l.dst, r.qty FROM lastrow l
  JOIN sym r ON r.src = l.src AND r.dst = l.dst AND r.ord = l.mo
),
mi AS MATERIALIZED (SELECT src, dst, MIN(qty) AS qty FROM sym GROUP BY src, dst)
SELECT b.src, b.dst,
       ROUND(mn.qty, 6) AS qty_merge_new,
       ROUND(mo.qty, 6) AS qty_merge_old,
       ROUND(ov.qty, 6) AS qty_overwrite,
       ROUND(mi.qty, 6) AS qty_min
FROM base b
LEFT JOIN mn ON b.src = mn.src AND b.dst = mn.dst
LEFT JOIN mo ON b.src = mo.src AND b.dst = mo.dst
LEFT JOIN ov ON b.src = ov.src AND b.dst = ov.dst
LEFT JOIN mi ON b.src = mi.src AND b.dst = mi.dst
"""


def _walk_ctes(
    walks_per_vertex: int, walk_length: int, seed: str
) -> tuple[str, str]:
    """(CTE block, per-step UNION ALL select) shared by the walk oracles:
    sorted neighbor lists + the portable 60-bit md5 choice
    nbrs[h(seed:walk:step:vid) % deg + 1], unrolled one CTE per step
    (AS MATERIALIZED - chained CTEs re-inline exponentially otherwise)."""
    wpv = walks_per_vertex
    ctes = [
        f"""adj AS MATERIALIZED (
  SELECT src AS vid, list(dst ORDER BY dst) AS nbrs, COUNT(*) AS deg
  FROM e GROUP BY src
),
w0 AS MATERIALIZED (
  SELECT v.vid * {wpv} + r.r AS walk_id, v.vid AS start, v.vid AS vid
  FROM (SELECT DISTINCT src AS vid FROM e) v
  CROSS JOIN (SELECT unnest(generate_series(0, {wpv - 1})) AS r) r
)"""
    ]
    for t in range(1, walk_length + 1):
        h = (
            f"(\'0x\' || substr(md5(\'{seed}:\' || w.walk_id || \':\' || {t - 1} "
            f"|| \':\' || w.vid), 1, 15))::BIGINT"
        )
        ctes.append(
            f"""w{t} AS MATERIALIZED (
  SELECT w.walk_id, w.start, a.nbrs[CAST({h} % a.deg + 1 AS INT)] AS vid
  FROM w{t - 1} w JOIN adj a ON a.vid = w.vid
)"""
        )
    unions = "\nUNION ALL ".join(
        f"SELECT walk_id, start, CAST({t} AS INTEGER) AS step, vid FROM w{t}"
        for t in range(walk_length + 1)
    )
    return ",\n".join(ctes), unions


def random_walks_sql(
    walks_per_vertex: int = 2, walk_length: int = 6, seed: str = "walk"
) -> str:
    """DuckDB twin of operators.walks.random_walks over the
    customer-supplier graph."""
    ctes, unions = _walk_ctes(walks_per_vertex, walk_length, seed)
    return f"WITH {EDGES_CS},\n{ctes}\n{unions}"


def skipgram_pairs_sql(
    walks_per_vertex: int = 2,
    walk_length: int = 6,
    seed: str = "walk",
    window: int = 2,
) -> str:
    """DuckDB twin of operators.walks.skipgram_pairs over the walk corpus."""
    ctes, unions = _walk_ctes(walks_per_vertex, walk_length, seed)
    return f"""WITH {EDGES_CS},
{ctes},
walks AS MATERIALIZED ({unions})
SELECT a.vid AS center, b.vid AS context, COUNT(*) AS cnt
FROM walks a JOIN walks b
  ON a.walk_id = b.walk_id AND a.step <> b.step
 AND abs(a.step - b.step) <= {window}
GROUP BY 1, 2
"""


def neighborhood_sample_sql(
    fanouts: tuple[int, ...] = (3, 2), seed: str = "gnn"
) -> str:
    """DuckDB twin of operators.gnn.neighborhood_sample over the
    customer-supplier graph, all vertices as roots: per hop h, keep the
    fanouts[h-1] neighbors with the smallest 60-bit md5(seed:h:src:dst)
    rank (dst tie-break), then chain blocks root->hop1->hop2->..."""
    ctes = [f"roots AS MATERIALIZED (SELECT DISTINCT src AS root FROM e)"]
    for h, fanout in enumerate(fanouts, start=1):
        rank = (
            f"('0x' || substr(md5('{seed}:{h}:' || src || ':' || dst), 1, 15))::BIGINT"
        )
        ctes.append(
            f"""s{h} AS MATERIALIZED (
  SELECT src, dst FROM (
    SELECT src, dst,
           row_number() OVER (PARTITION BY src ORDER BY {rank}, dst) AS rk
    FROM e
  ) WHERE rk <= {fanout}
)"""
        )
    blocks = [
        """b1 AS MATERIALIZED (
  SELECT f.root, f.root AS src, s.dst FROM roots f JOIN s1 s ON s.src = f.root
)"""
    ]
    for h in range(2, len(fanouts) + 1):
        blocks.append(
            f"""b{h} AS MATERIALIZED (
  SELECT f.root, f.vid AS src, s.dst
  FROM (SELECT DISTINCT root, dst AS vid FROM b{h - 1}) f
  JOIN s{h} s ON s.src = f.vid
)"""
        )
    unions = "\nUNION ALL ".join(
        f"SELECT root, CAST({h} AS INTEGER) AS hop, src, dst FROM b{h}"
        for h in range(1, len(fanouts) + 1)
    )
    return f"WITH {EDGES_CS},\n" + ",\n".join(ctes + blocks) + f"\n{unions}"


def node2vec_walks_sql(
    walks_per_vertex: int = 2,
    walk_length: int = 6,
    p: float = 0.25,
    q: float = 4.0,
    seed: str = "n2v",
) -> str:
    """DuckDB twin of operators.walks.node2vec_walks over the
    customer-supplier graph: step 1 is the uniform indexed choice; each
    later step partitions the current vertex's sorted neighbor list into
    {prev} / common (also neighbors of prev) / rest, lays the
    integer-scaled 1/p,1,1/q weight mass end-to-end in that order, and
    resolves u = h % total to a class by two comparisons and to a member
    by integer division — the same O(1) class-partitioned draw the Spark
    operator makes (distribution-identical to the textbook cumulative
    scan; weights within a class are equal)."""
    from hugegraph_computer_spark.operators.walks import _bias_weights

    w_ret, w_in, w_out = _bias_weights(p, q)
    wpv = walks_per_vertex
    ctes = [
        f"""adj AS MATERIALIZED (
  SELECT src AS vid, list(dst ORDER BY dst) AS nbrs, COUNT(*) AS deg
  FROM e GROUP BY src
),
w0 AS MATERIALIZED (
  SELECT v.vid * {wpv} + r.r AS walk_id, v.vid AS start,
         CAST(NULL AS BIGINT) AS prev, v.vid AS vid
  FROM (SELECT DISTINCT src AS vid FROM e) v
  CROSS JOIN (SELECT unnest(generate_series(0, {wpv - 1})) AS r) r
)"""
    ]
    if walk_length >= 1:
        h1 = (
            f"('0x' || substr(md5('{seed}:' || w.walk_id || ':0' "
            f"|| ':' || w.vid), 1, 15))::BIGINT"
        )
        ctes.append(
            f"""w1 AS MATERIALIZED (
  SELECT w.walk_id, w.start, w.vid AS prev,
         a.nbrs[CAST({h1} % a.deg + 1 AS INT)] AS vid
  FROM w0 w JOIN adj a ON a.vid = w.vid
)"""
        )
    for t in range(2, walk_length + 1):
        h = (
            f"('0x' || substr(md5('{seed}:' || w.walk_id || ':' || {t - 1} "
            f"|| ':' || w.vid), 1, 15))::BIGINT"
        )
        ctes.append(
            f"""w{t} AS MATERIALIZED (
  SELECT walk_id, start, cur AS prev,
         CASE WHEN u < c_ret THEN prevv
              WHEN u < c_in THEN common[CAST((u - c_ret) // {w_in} AS INT) + 1]
              ELSE rest[CAST((u - c_in) // {w_out} AS INT) + 1] END AS vid
  FROM (
    SELECT q.*, h % (c_in + {w_out} * len(rest)) AS u,
           {w_ret} * hasret AS c_ret
    FROM (
      SELECT c.*, {w_ret} * hasret + {w_in} * len(common) AS c_in
      FROM (
        SELECT w.walk_id, w.start, w.prev AS prevv, w.vid AS cur,
               CASE WHEN list_contains(a.nbrs, w.prev) THEN 1 ELSE 0 END AS hasret,
               list_sort(list_intersect(
                 list_filter(a.nbrs, x -> x <> w.prev),
                 COALESCE(p.nbrs, CAST([] AS BIGINT[])))) AS common,
               list_sort(list_filter(a.nbrs,
                 x -> x <> w.prev AND NOT list_contains(
                   COALESCE(p.nbrs, CAST([] AS BIGINT[])), x))) AS rest,
               {h} AS h
        FROM w{t - 1} w
        JOIN adj a ON a.vid = w.vid
        LEFT JOIN adj p ON p.vid = w.prev
      ) c
    ) q
  )
)"""
        )
    unions = "\nUNION ALL ".join(
        f"SELECT walk_id, start, CAST({t} AS INTEGER) AS step, vid FROM w{t}"
        for t in range(walk_length + 1)
    )
    return f"WITH {EDGES_CS},\n" + ",\n".join(ctes) + f"\n{unions}"


def chunk_documents_sql(max_tokens: int = 128, overlap: int = 16) -> str:
    """DuckDB twin of operators.text.chunk_documents (same stride math,
    1-based inclusive list_slice == Spark's slice(start, length) here
    because the window length is fixed)."""
    stride = max_tokens - overlap
    return f"""
WITH t AS (
  SELECT doc_id, string_split(lower(text), ' ') AS toks,
         len(string_split(lower(text), ' ')) AS n
  FROM documents
),
c AS (
  SELECT doc_id, toks, n,
         CASE WHEN n <= {max_tokens} THEN 1
              ELSE 1 + CAST(ceil((n - {max_tokens}) / {stride}.0) AS INT)
         END AS n_chunks
  FROM t
)
SELECT doc_id,
       CAST(k.k AS INTEGER) AS chunk_id,
       CAST(len(toks[k.k * {stride} + 1 : k.k * {stride} + {max_tokens}]) AS INTEGER) AS n_tokens,
       array_to_string(toks[k.k * {stride} + 1 : k.k * {stride} + {max_tokens}], ' ') AS chunk_text
FROM c, LATERAL (SELECT unnest(generate_series(0, n_chunks - 1)) AS k) k
"""


def tfidf_topk_sql(k: int = 5) -> str:
    """DuckDB twin of operators.text.tfidf_topk (ratio-form score:
    exact integer products + one IEEE division, so value-hash-stable)."""
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term FROM documents
),
tf AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM toks WHERE term <> '' GROUP BY 1, 2
),
df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
n AS (SELECT COUNT(*) AS n_docs FROM documents)
SELECT doc_id, term, tf, df, score, rank FROM (
  SELECT tf.doc_id, tf.term, tf.tf, df.df,
         CAST(tf.tf * (n.n_docs + 1) AS DOUBLE) / (df.df + 1) AS score,
         CAST(row_number() OVER (
           PARTITION BY tf.doc_id
           ORDER BY CAST(tf.tf * (n.n_docs + 1) AS DOUBLE) / (df.df + 1) DESC,
                    tf.term ASC
         ) AS INTEGER) AS rank
  FROM tf JOIN df USING (term) CROSS JOIN n
) WHERE rank <= {k}
"""


def pmi_skipgram_sql(
    walks_per_vertex: int = 2,
    walk_length: int = 6,
    seed: str = "walk",
    window: int = 2,
) -> str:
    """DuckDB twin of pmi_scores over the skip-gram pairs of the walk
    corpus (operators.text.pmi_scores ∘ operators.walks.skipgram_pairs)."""
    ctes, unions = _walk_ctes(walks_per_vertex, walk_length, seed)
    return f"""WITH {EDGES_CS},
{ctes},
walks AS MATERIALIZED ({unions}),
pairs AS MATERIALIZED (
  SELECT a.vid AS center, b.vid AS context, COUNT(*) AS cnt
  FROM walks a JOIN walks b
    ON a.walk_id = b.walk_id AND a.step <> b.step
   AND abs(a.step - b.step) <= {window}
  GROUP BY 1, 2
)
SELECT center, context, cnt,
       CAST(cnt * (SELECT SUM(cnt) FROM pairs) AS DOUBLE)
       / (SUM(cnt) OVER (PARTITION BY center) * SUM(cnt) OVER (PARTITION BY context))
       AS pmi_ratio
FROM pairs
"""


def decontaminate_sql(shingle_n: int = 5, bench_mod: int = 20) -> str:
    """DuckDB twin of operators.dedup.decontaminate over the gate split
    (benchmark = doc_id % bench_mod == 0, train = the rest)."""
    return f"""
WITH toks AS MATERIALIZED (SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents),
sh AS MATERIALIZED (SELECT doc_id, {_shingles_sql(shingle_n)} AS sh FROM toks),
bgrams AS MATERIALIZED (
  SELECT DISTINCT md5(g) AS gh
  FROM (SELECT unnest(sh) AS g FROM sh WHERE doc_id % {bench_mod} = 0)
),
tgrams AS (
  SELECT doc_id, md5(g) AS gh
  FROM (SELECT doc_id, unnest(sh) AS g FROM sh WHERE doc_id % {bench_mod} <> 0)
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_grams,
       CAST(SUM(CASE WHEN gh IN (SELECT gh FROM bgrams) THEN 1 ELSE 0 END) AS BIGINT) AS hits,
       CAST(SUM(CASE WHEN gh IN (SELECT gh FROM bgrams) THEN 1 ELSE 0 END) AS DOUBLE)
       / COUNT(*) AS overlap_frac
FROM tgrams
GROUP BY doc_id
"""


def repetition_stats_sql(ngram_n: int = 2, dup_ngram_n: int = 5) -> str:
    """DuckDB twin of operators.text.repetition_stats (POSITIONAL grams —
    no list_distinct — since repetition is what distinct would erase)."""

    def grams(n: int) -> str:
        return (
            f"list_transform(range(1, GREATEST(len(t) - {n}, 0) + 2), "
            f"i -> array_to_string(list_slice(t, i, i + {n - 1}), ' '))"
        )

    return f"""
WITH toks AS MATERIALIZED (SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents),
gc_top AS MATERIALIZED (
  SELECT doc_id, g, COUNT(*) AS cnt
  FROM (SELECT doc_id, unnest({grams(ngram_n)}) AS g FROM toks)
  GROUP BY 1, 2
),
gc_dup AS MATERIALIZED (
  SELECT doc_id, g, COUNT(*) AS cnt
  FROM (SELECT doc_id, unnest({grams(dup_ngram_n)}) AS g FROM toks)
  GROUP BY 1, 2
),
top AS (
  SELECT doc_id, SUM(cnt) AS n_ngrams, MAX(cnt) AS top_cnt FROM gc_top GROUP BY 1
),
dup AS (
  SELECT doc_id, SUM(cnt) AS n_dup_grams,
         SUM(CASE WHEN cnt >= 2 THEN cnt ELSE 0 END) AS dup_occ
  FROM gc_dup GROUP BY 1
)
SELECT top.doc_id,
       CAST(n_ngrams AS BIGINT) AS n_ngrams,
       CAST(top_cnt AS DOUBLE) / n_ngrams AS top_ngram_frac,
       CAST(dup_occ AS DOUBLE) / n_dup_grams AS dup_ngram_frac
FROM top JOIN dup ON top.doc_id = dup.doc_id
"""


def ppr_sql(
    supersteps: int = 6,
    alpha: float = 0.15,
    src_mod: int = 50,
    round_to: int = 9,
    edges_cte: str = EDGES_CS,
) -> str:
    """Unrolled personalized PageRank (operators.pagerank.
    personalized_pagerank): r0 = e_S; each superstep
    ``(Σ msgs + dangling_prev·sflag)·(1-alpha) + alpha·sflag`` — the
    mass-conserving restart-through-source-set recurrence. Gate source
    set: vertices with vid % src_mod == 0."""
    parts = [
        f"WITH {edges_cte}",
        "v AS MATERIALIZED (SELECT DISTINCT src AS vid FROM e)",
        "dg AS MATERIALIZED (SELECT src AS vid, CAST(COUNT(*) AS BIGINT) AS deg FROM e GROUP BY src)",
        "d AS MATERIALIZED (SELECT v.vid, COALESCE(dg.deg, 0) AS deg "
        "FROM v LEFT JOIN dg ON v.vid = dg.vid)",
        f"s AS MATERIALIZED (SELECT vid FROM d WHERE vid % {src_mod} = 0)",
        "ns AS MATERIALIZED (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM s)",
        "r0 AS MATERIALIZED (SELECT d.vid, d.deg, "
        "CASE WHEN s.vid IS NOT NULL THEN (SELECT 1.0/n FROM ns) ELSE 0.0 END AS sflag, "
        "CASE WHEN s.vid IS NOT NULL THEN (SELECT 1.0/n FROM ns) ELSE 0.0 END AS rank "
        "FROM d LEFT JOIN s ON d.vid = s.vid)",
        "a0 AS MATERIALIZED (SELECT COALESCE(SUM(CASE WHEN deg = 0 THEN rank END), 0.0) AS dang FROM r0)",
    ]
    for c in range(1, supersteps):
        p = c - 1
        parts.append(
            f"m{c} AS MATERIALIZED (SELECT e.dst AS vid, SUM(r.rank / r.deg) AS msg "
            f"FROM r{p} r JOIN e ON r.vid = e.src WHERE r.deg > 0 GROUP BY e.dst)"
        )
        parts.append(
            f"r{c} AS MATERIALIZED (SELECT r.vid, r.deg, r.sflag, "
            f"(COALESCE(m.msg, 0.0) + (SELECT dang FROM a{p}) * r.sflag) * {1.0 - alpha!r} "
            f"+ {alpha!r} * r.sflag AS rank "
            f"FROM r{p} r LEFT JOIN m{c} m ON r.vid = m.vid)"
        )
        parts.append(
            f"a{c} AS MATERIALIZED (SELECT COALESCE(SUM(CASE WHEN deg = 0 THEN rank END), 0.0) AS dang FROM r{c})"
        )
    last = supersteps - 1
    return (
        ",\n".join(parts)
        + f"\nSELECT vid, ROUND(rank, {round_to}) AS rank FROM r{last}"
    )
