"""Deterministic synthetic source-code corpus (FIXTURES.md F1/F7).

Input shape mandated by BASELINE.json ``input_hint``: a table of
source-code repositories ``(repo string, path string, commit string,
lang string, content string)`` — in production an Iceberg table at
10^12-file scale; here synthesized deterministically (seeded, no external
data) at any small scale for tests and benchmarks.

``content`` embeds ``import repo_XXXXXX`` lines; the import targets are
rank-biased toward low repo ids (square-law ≈ Zipf(a=2)) so the derived
link graph has power-law in-degree hubs (the skew the north rule requires
us to handle explicitly).

Generation is a PURE HASH FUNCTION of (seed, file index) — no RNG state:

    H(s)      = int(md5(s).hexdigest()[:15], 16)          (60-bit)
    m_i       = H(f"{seed}:m:{i}") % (2*mean_imports + 1) (mean ≈ mean_imports)
    x_ij      = H(f"{seed}:t:{i}:{j}") % 2^20
    target_ij = (n_repos * x_ij * x_ij) >> 40             (square-law bias)

so any partitioning — any cluster size — generates byte-identical rows
(the per-row sha256 invariant in extract.py depends on this), AND the
derived edge list is reproducible in ANSI SQL (md5 + integer arithmetic),
which is what gives corpus_pagerank / corpus_wcc their DuckDB oracles
(hugegraph_computer_spark.oracles.corpus_edges_sql).

Integer-exactness bound: n_repos * (2^20)^2 must fit in int64 →
n_repos < 2^23 (≈8.4M repos); asserted.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StringType, StructField, StructType

CORPUS_SCHEMA = StructType(
    [
        StructField("repo", StringType(), False),
        StructField("path", StringType(), False),
        StructField("commit", StringType(), False),
        StructField("lang", StringType(), False),
        StructField("content", StringType(), False),
    ]
)

# 60-bit hash (15 hex chars): portable between Python int, Spark
# conv(...,16,10)::long and DuckDB ('0x'||...)::BIGINT without sign issues.
_HEX_CHARS = 15
_X_BITS = 20  # target-draw resolution; n_repos*x^2 >> 2*_X_BITS stays in int64


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:_HEX_CHARS], 16)


def file_row(seed: int, i: int, n_repos: int, files_per_repo: int, mean_imports: int):
    """Content of global file index ``i`` — pure function, no RNG.

    Returns (repo, path, commit, lang, content). The import targets are
    ``(n_repos * x² ) >> 40`` for 20-bit draws x — square-law rank bias,
    integer-exact (reproduced verbatim by oracles.corpus_edges_sql)."""
    r, k = divmod(i, files_per_repo)
    repo = f"repo_{r:06d}"
    path = f"src/mod_{k % 3}/file_{k}.py"
    lang = "java" if i % 29 == 7 else "python"
    m = _h60(f"{seed}:m:{i}") % (2 * mean_imports + 1)
    targets = []
    for j in range(m):
        x = _h60(f"{seed}:t:{i}:{j}") % (1 << _X_BITS)
        t = (n_repos * x * x) >> (2 * _X_BITS)
        if t != r:
            targets.append(t)
    targets = sorted(set(targets))
    if lang == "python":
        imports = "\n".join(f"import repo_{t:06d}" for t in targets)
    else:
        imports = "\n".join(f"import com.example.repo_{t:06d}.Lib;" for t in targets)
    body = (
        f'"""module {repo}/{path}"""\n{imports}\n\n'
        f"def handler_{k}():\n    return {r * 31 + k}\n"
    )
    commit = hashlib.sha256(f"{repo}/{path}".encode()).hexdigest()[:40]
    return repo, path, commit, lang, body


def synth_corpus(
    spark: SparkSession,
    n_repos: int = 100,
    files_per_repo: int = 5,
    mean_imports: int = 4,
    seed: int = 42,
    num_partitions: int | None = None,
) -> DataFrame:
    """Build the corpus DataFrame. Deterministic in all arguments.

    Each file imports m ∈ [0, 2·mean_imports] target repos (hash-drawn,
    square-law rank-biased toward low repo ids → hub vertices). A sprinkle
    of rows is lang='java' to exercise language filtering in the extractor
    (those contents contain java-style imports the python extractor must
    ignore).
    """
    assert n_repos < (1 << 23), "square-law draw overflows int64 past 2^23 repos"
    if num_partitions is None:
        num_partitions = int(
            spark.conf.get("spark.sql.shuffle.partitions", "32")
        )
    n_files = n_repos * files_per_repo
    bounds = np.linspace(0, n_files, num_partitions + 1).astype("int64")
    parts = [
        (int(i), int(bounds[i]), int(bounds[i + 1])) for i in range(num_partitions)
    ]

    def gen(iterator: Iterator) -> Iterator[pd.DataFrame]:
        for _pid, lo, hi in iterator:
            if hi <= lo:
                continue
            rows = [
                file_row(seed, i, n_repos, files_per_repo, mean_imports)
                for i in range(lo, hi)
            ]
            yield pd.DataFrame(
                rows, columns=["repo", "path", "commit", "lang", "content"]
            )

    part_df = spark.createDataFrame(parts, "pid int, lo long, hi long").repartition(
        num_partitions, "pid"
    )
    return part_df.mapInPandas(
        lambda it: gen(
            (int(r["pid"]), int(r["lo"]), int(r["hi"]))
            for pdf in it
            for _, r in pdf.iterrows()
        ),
        schema=CORPUS_SCHEMA,
    )
