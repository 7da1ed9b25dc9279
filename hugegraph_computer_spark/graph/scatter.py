"""Vectorized Arrow/numpy gather-scatter kernel over the CSR adjacency.

The SQL scatter (``explode(nbrs) -> groupBy(dst).sum``) pays Tungsten's
per-row costs twice on E rows: the Generate and a hash aggregate whose
random-access probe table is memory-bound at millions of distinct keys.
This kernel moves exactly that segment — and nothing else — into one
Arrow-batched numpy pass per partition:

    flat  = concat(nbrs arrays)            # the partition's CSR column
    w     = repeat(contrib per src, deg)   # gather
    part  = bincount(flat, weights=w)      # scatter+combine, dense
    emit nonzero (dst, partial)            # sparse partials, same rows as
                                           # Spark's map-side partial agg

The surrounding plan is unchanged: the co-partitioned adjacency ⋈ contrib
join stays JVM-side, the emitted partials feed the same
``groupBy(dst).sum`` reduce, so the result is numerically equivalent
re-association of the identical sums (validated against the SQL kernel to
1e-12 in tests). Python never sees per-row objects — only whole Arrow
columns (input_hint: "no per-row Python").

Requires ids in [0, max_id] with a dense-enough range that a float64
accumulator of max_id+1 entries fits comfortably per task (dense ids from
graph.dense_ids satisfy this by construction). ``fits(max_id)`` guards the
auto path; the SQL kernel remains the fallback for sparse id spaces.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

# 64M ids -> 512MB accumulator per task: the ceiling for the dense kernel.
MAX_DENSE_IDS = 64_000_000


def fits(max_id: int) -> bool:
    return 0 <= max_id < MAX_DENSE_IDS


def scatter_sum(joined: DataFrame, max_id: int) -> DataFrame:
    """(vid, nbrs array<long>, contrib double) -> per-partition partial
    sums ``(dst long, msg_sum double)`` — the numpy twin of
    explode+partial-aggregate. Chunked hub rows (same vid, several chunks)
    are handled naturally: each chunk contributes its own repeat."""
    n = int(max_id) + 1

    def kernel(batches):
        flats: list[np.ndarray] = []
        ws: list[np.ndarray] = []
        for pdf in batches:
            if not len(pdf):
                continue
            contrib = pdf["contrib"].to_numpy(dtype=np.float64)
            nbrs = pdf["nbrs"].tolist()
            lens = np.fromiter(
                (len(a) for a in nbrs), dtype=np.int64, count=len(nbrs)
            )
            if lens.sum() == 0:
                continue
            flats.append(
                np.concatenate([np.asarray(a, dtype=np.int64) for a in nbrs])
            )
            ws.append(np.repeat(contrib, lens))
        if flats:
            flat = np.concatenate(flats) if len(flats) > 1 else flats[0]
            w = np.concatenate(ws) if len(ws) > 1 else ws[0]
            acc = np.bincount(flat, weights=w, minlength=n)
            nz = np.nonzero(acc)[0]
            yield pd.DataFrame({"dst": nz, "msg_sum": acc[nz]})

    return joined.mapInPandas(kernel, "dst long, msg_sum double")


def scatter_min(joined: DataFrame, max_id: int) -> DataFrame:
    """(vid, nbrs array<long>, label long) -> per-partition label minima
    ``(dst long, msg long)`` — the numpy twin of explode+partial-min
    (ValueMinCombiner). Uses ``np.minimum.at`` over a dense accumulator
    initialized to a sentinel above any label."""
    n = int(max_id) + 1

    def kernel(batches):
        flats: list[np.ndarray] = []
        ls: list[np.ndarray] = []
        for pdf in batches:
            if not len(pdf):
                continue
            labels = pdf["label"].to_numpy(dtype=np.int64)
            nbrs = pdf["nbrs"].tolist()
            lens = np.fromiter((len(a) for a in nbrs), dtype=np.int64, count=len(nbrs))
            if lens.sum() == 0:
                continue
            flats.append(np.concatenate([np.asarray(a, dtype=np.int64) for a in nbrs]))
            ls.append(np.repeat(labels, lens))
        if flats:
            flat = np.concatenate(flats) if len(flats) > 1 else flats[0]
            lab = np.concatenate(ls) if len(ls) > 1 else ls[0]
            sentinel = np.iinfo(np.int64).max
            acc = np.full(n, sentinel, dtype=np.int64)
            np.minimum.at(acc, flat, lab)
            nz = np.nonzero(acc != sentinel)[0]
            yield pd.DataFrame({"dst": nz, "msg": acc[nz]})

    return joined.mapInPandas(kernel, "dst long, msg long")


def scatter_sum_flat(joined: DataFrame, max_id: int) -> DataFrame:
    """(dst long, contrib double) flat rows -> per-partition partial sums
    ``(dst long, msg_sum double)``.

    The flat variant of :func:`scatter_sum`: the gather join happens
    JVM-side against the co-partitioned flat edge table, so Arrow ships two
    primitive columns (no nested lists -> no per-row numpy allocation) and
    the kernel is a single bincount per partition. This is the fast path;
    the CSR variant remains for chunk-aware processing.

    Operational note (measured on the 96M-edge bench graph): long
    multi-superstep runs with >=10M-row partitions need
    ``spark.python.worker.reuse=false`` — reused Python workers accumulate
    Arrow-stream memory across supersteps and the whole worker pool
    eventually dies. Even then the SQL explode+aggregate kernel is ~2.4x
    faster at this scale (BENCH.md kernel table); these kernels earn their
    keep only when per-edge Python math is genuinely needed."""
    n = int(max_id) + 1

    def kernel(batches):
        flats: list[np.ndarray] = []
        ws: list[np.ndarray] = []
        for pdf in batches:
            if not len(pdf):
                continue
            flats.append(pdf["dst"].to_numpy(dtype=np.int64))
            ws.append(pdf["contrib"].to_numpy(dtype=np.float64))
        if flats:
            flat = np.concatenate(flats) if len(flats) > 1 else flats[0]
            w = np.concatenate(ws) if len(ws) > 1 else ws[0]
            acc = np.bincount(flat, weights=w, minlength=n)
            nz = np.nonzero(acc)[0]
            yield pd.DataFrame({"dst": nz, "msg_sum": acc[nz]})

    return joined.mapInPandas(kernel, "dst long, msg_sum double")
