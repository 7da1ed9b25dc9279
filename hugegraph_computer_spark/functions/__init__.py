"""Scalar/column function library.

The reference has no scalar-function layer (SURVEY.md §2.8) — its only
scalar math lives inside algorithms. Ours collects the reusable column
expressions so every operator stays JVM-side:

* hashing/fingerprints: md5/sha2/xxhash64 wrappers used by dedup + the
  content-integrity invariant
* text: tokenization, shingles (re-exported from operators.text/dedup)
* vector math: dot/norm/cosine over array columns (similarity)
"""

from pyspark.sql import Column, functions as F

from hugegraph_computer_spark.operators.dedup import shingles
from hugegraph_computer_spark.operators.similarity import cosine, _dot as dot, _norm as norm


def content_sha(col: str | Column) -> Column:
    """sha2-256 hex — the per-row integrity invariant column."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sha2(c, 256)


def stable_hash64(*cols) -> Column:
    """xxhash64 — partitioning/salting key (NOT for cross-engine parity;
    use md5/sha2 where DuckDB must reproduce the value)."""
    return F.xxhash64(*[F.col(c) if isinstance(c, str) else c for c in cols])


__all__ = ["shingles", "cosine", "dot", "norm", "content_sha", "stable_hash64"]
