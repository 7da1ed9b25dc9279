"""Deterministic synthetic source-code corpus (FIXTURES.md F1/F7).

Input shape mandated by BASELINE.json ``input_hint``: a table of
source-code repositories ``(repo string, path string, commit string,
lang string, content string)`` — in production an Iceberg table at
10^12-file scale; here synthesized deterministically (seeded, no external
data) at any small scale for tests and benchmarks.

``content`` embeds ``import repo_XXXXXX`` lines; the import targets follow
a Zipf(a) distribution over repos so the derived link graph has power-law
in-degree hubs (the skew the north rule requires us to handle explicitly).
Generation is distributed: the driver broadcasts nothing but scalars; each
Spark partition generates its id range with a numpy PCG64 stream seeded by
(seed, partition) — fully reproducible at any parallelism, so the same
(seed, n_repos, ...) always yields byte-identical content (the per-row
sha256 invariant in extract.py depends on this).
"""

from __future__ import annotations

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


def synth_corpus(
    spark: SparkSession,
    n_repos: int = 100,
    files_per_repo: int = 5,
    mean_imports: int = 4,
    zipf_a: float = 2.0,
    seed: int = 42,
    num_partitions: int | None = None,
) -> DataFrame:
    """Build the corpus DataFrame. Deterministic in all arguments.

    Each file imports ~Poisson(mean_imports) target repos drawn
    Zipf(zipf_a)-style (rank-biased toward low repo ids → hub vertices).
    A sprinkle of rows is lang='java' to exercise language filtering in the
    extractor (those contents contain java-style imports the python
    extractor must ignore).
    """
    import hashlib

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
        for pid, lo, hi in iterator:
            if hi <= lo:
                continue
            idx = np.arange(lo, hi)
            repo_i = idx // files_per_repo
            file_k = idx % files_per_repo
            rows_repo, rows_path, rows_commit, rows_lang, rows_content = (
                [],
                [],
                [],
                [],
                [],
            )
            for i, r, k in zip(idx, repo_i, file_k):
                # seed per FILE, not per partition: content is a pure
                # function of (seed, file index) so any partitioning — any
                # cluster size — generates byte-identical rows (the sha256
                # invariant depends on this).
                rng = np.random.Generator(np.random.PCG64(seed * 1_000_003 + int(i)))
                repo = f"repo_{r:06d}"
                path = f"src/mod_{k % 3}/file_{k}.py"
                lang = "java" if (r * files_per_repo + k) % 29 == 7 else "python"
                m = int(rng.poisson(mean_imports))
                # Zipf-ish rank-biased targets in [0, n_repos), excluding self
                if m > 0:
                    u = rng.random(m)
                    targets = np.unique(
                        (n_repos * u ** zipf_a).astype("int64") % n_repos
                    )
                    targets = targets[targets != r]
                else:
                    targets = np.empty(0, dtype="int64")
                if lang == "python":
                    imports = "\n".join(f"import repo_{t:06d}" for t in targets)
                else:
                    imports = "\n".join(
                        f"import com.example.repo_{t:06d}.Lib;" for t in targets
                    )
                body = (
                    f'"""module {repo}/{path}"""\n{imports}\n\n'
                    f"def handler_{k}():\n    return {int(r) * 31 + int(k)}\n"
                )
                commit = hashlib.sha256(f"{repo}/{path}".encode()).hexdigest()[:40]
                rows_repo.append(repo)
                rows_path.append(path)
                rows_commit.append(commit)
                rows_lang.append(lang)
                rows_content.append(body)
            yield pd.DataFrame(
                {
                    "repo": rows_repo,
                    "path": rows_path,
                    "commit": rows_commit,
                    "lang": rows_lang,
                    "content": rows_content,
                }
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
