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


def pagerank_sql(supersteps: int = 6, alpha: float = 0.15, round_to: int = 9) -> str:
    """Unrolled reference PageRank (SURVEY.md §2.12): superstep 0 sets
    rank=1/N; each update computes
    ``((dangling_prev/N + Σ msgs) * (1-alpha) + alpha/N) / cumulative_prev``
    with the PREVIOUS superstep's global aggregates — one CTE pair per
    superstep."""
    parts = [
        f"WITH {EDGES_CS}",
        "d AS MATERIALIZED (SELECT src AS vid, CAST(COUNT(*) AS BIGINT) AS deg FROM e GROUP BY src)",
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
    return (
        ",\n".join(parts)
        + f"\nSELECT vid, ROUND(CAST(rank AS DOUBLE), {round_to}) AS rank FROM r{last}"
    )


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


def fingerprint_sql() -> str:
    return r"""
SELECT doc_id,
       md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) AS fp
FROM documents
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


def ivf_topk_sql(
    planes: list[list[float]], k: int = 10, n_queries: int = 8
) -> str:
    """Bucket = sign pattern against the literal hyperplanes (the exact
    floats the engine uses — operators.similarity._hyperplanes)."""

    def bucket_expr(vec: str) -> str:
        bits = []
        for i, p in enumerate(planes):
            lit = "[" + ", ".join(repr(float(x)) for x in p) + "]"
            bits.append(
                f"(CASE WHEN list_dot_product({vec}, {lit}) >= 0 "
                f"THEN {1 << i} ELSE 0 END)"
            )
        return "CAST(" + " + ".join(bits) + " AS BIGINT)"

    return f"""
WITH q AS MATERIALIZED (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv,
                  {bucket_expr("CAST(embedding AS DOUBLE[])")} AS bucket
           FROM embeddings WHERE vec_id < {n_queries}),
c AS MATERIALIZED (SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS cv,
             {bucket_expr("CAST(embedding AS DOUBLE[])")} AS bucket
      FROM embeddings),
s AS MATERIALIZED (
  SELECT q.query_id, c.neighbor_id, {_COS} AS score
  FROM c JOIN q USING (bucket) WHERE c.neighbor_id <> q.query_id
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
    planes: list[list[float]], threshold: float = 0.8
) -> str:
    """LSH-bucketed embedding near-dup pairs with exact cosine filter —
    literal hyperplanes shared with the engine."""

    def bucket_expr(vec: str) -> str:
        bits = []
        for i, p in enumerate(planes):
            lit = "[" + ", ".join(repr(float(x)) for x in p) + "]"
            bits.append(
                f"(CASE WHEN list_dot_product({vec}, {lit}) >= 0 "
                f"THEN {1 << i} ELSE 0 END)"
            )
        return "CAST(" + " + ".join(bits) + " AS BIGINT)"

    return f"""
WITH v AS MATERIALIZED (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec,
         {bucket_expr("CAST(embedding AS DOUBLE[])")} AS bucket
  FROM embeddings
)
SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b,
       ROUND(list_dot_product(a.vec, b.vec) /
             (sqrt(list_dot_product(a.vec, a.vec)) *
              sqrt(list_dot_product(b.vec, b.vec))), 6) AS score
FROM v a JOIN v b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
WHERE list_dot_product(a.vec, b.vec) /
      (sqrt(list_dot_product(a.vec, a.vec)) *
       sqrt(list_dot_product(b.vec, b.vec))) >= {threshold!r}
"""
