"""Deterministic sampling & sharded export for training-data pipelines.

The two stages that sit between curation and the trainer at 100 TB:

* ``deterministic_sample`` — hash-gated per-stratum subsampling (dataset
  mixture weighting): keep a row iff its portable 60-bit md5 draw falls
  under the stratum's rate. Pure JVM column expressions — a FILTER, not
  a shuffle: runs at scan speed, composes with predicate pushdown, and
  is reproducible across runs/engines (no RNG state, no partition-order
  dependence — ``df.sample`` is neither stable under repartitioning nor
  reproducible in a resumed job, which is why curation pipelines gate on
  content hashes instead).
* ``shard_assign`` / ``export_shards`` — deterministic global shard
  assignment (``md5(id) mod n_shards``) and the partitioned writer that
  materializes one directory per shard. Hash sharding is the standard
  trainer-feed layout: shard membership is stable under re-runs and
  appends, balanced to ±O(sqrt) by the hash, and the write
  repartitions by shard so each output task streams exactly one shard.

Both draw from the engine's portable md5 family (60-bit prefix via
``conv(substring(md5(x),1,15),16,10)`` — fits a signed 64-bit in both
Spark and DuckDB), so every output is value-hash-checkable by a SQL
oracle. The reference has no sampling surface; these are
training-pipeline extensions like dedup/similarity/text.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# 60-bit md5 prefix modulo 1e6 — the engine-wide portable uniform draw
_MOD = 1_000_000


def _draw(col: Column, salt: str) -> Column:
    """Uniform integer draw in [0, 1e6) from the portable md5 family."""
    return (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(f"{salt}:"), col.cast("string"))), 1, 15),
            16,
            10,
        ).cast("long")
        % _MOD
    )


def deterministic_sample(
    docs: DataFrame,
    rates: dict[str, float] | float,
    stratum_col: str = "lang",
    id_col: str = "doc_id",
    salt: str = "sample",
) -> DataFrame:
    """Per-stratum deterministic subsample (mixture weighting).

    ``rates`` maps stratum value -> keep fraction in [0, 1]; strata not
    listed are dropped (rate 0). A scalar rate applies uniformly with no
    stratum column involved. A row survives iff
    ``md5_draw(salt:id) < rate·1e6`` — so the SAME ids survive at every
    scale factor, on resume, and in the DuckDB oracle; raising a
    stratum's rate strictly grows its sample (nested samples, the
    property mixture tuning needs). Emits the input columns plus the
    integer ``draw`` used for the gate (auditable)."""
    out = docs.withColumn("draw", _draw(F.col(id_col), salt))
    if isinstance(rates, dict):
        gate = F.lit(False)
        for stratum, rate in sorted(rates.items()):
            gate = gate | (
                (F.col(stratum_col) == stratum)
                & (F.col("draw") < int(round(rate * _MOD)))
            )
    else:
        gate = F.col("draw") < int(round(float(rates) * _MOD))
    return out.where(gate)


def shard_assign(
    docs: DataFrame,
    n_shards: int,
    id_col: str = "doc_id",
    salt: str = "shard",
) -> DataFrame:
    """Input columns plus ``shard`` = md5_draw(salt:id) mod n_shards —
    deterministic, append-stable shard membership."""
    return docs.withColumn(
        "shard", (_draw(F.col(id_col), salt) % n_shards).cast("long")
    )


def export_shards(
    docs: DataFrame,
    path: str,
    n_shards: int,
    id_col: str = "doc_id",
    salt: str = "shard",
) -> None:
    """Write ``path/shard=K/`` parquet, one directory per shard.

    ``repartition(n_shards, shard)`` hash-partitions on murmur3(shard) %
    n_shards, so a write task holds zero, one, or occasionally a few
    whole shards (hash collisions) — never fragments of many: total file
    count is bounded by O(n_shards), not tasks × shards. Readers
    (trainer data loaders) open one directory per worker; partition
    pruning makes per-shard reads free."""
    shards = shard_assign(docs, n_shards, id_col=id_col, salt=salt)
    (
        shards.repartition(n_shards, "shard")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(path)
    )
