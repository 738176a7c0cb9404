"""Cardinality sketches: exact distributed distinct-count and a
mergeable HyperLogLog estimator.

``count_distinct`` is the exact path (hash-partitioned groupby — one
uniform-key shuffle of the *distinct* values, oracle-checkable).
``approx_distinct`` is the 100 TB path: each batch folds into a
fixed-size register array (2^p bytes) inside one stateless
``map_batches`` pass, and partial sketches merge by elementwise max —
associative and commutative, so the merge order, partitioning, resume
point, and batch boundaries cannot change the estimate. The final
reduce touches only ``#batches × 2^p`` bytes of partials, never the
data.

Algorithm: HyperLogLog (Flajolet, Fusy, Gandouet, Meunier 2007) with
the standard small-range linear-counting correction; hash =
splitmix64 over pandas' 64-bit column hash. Deterministic for a given
(column, p, seed).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from rayfts.ops.sample import splitmix64


def _alpha(m: int) -> float:
    if m >= 128:
        return 0.7213 / (1 + 1.079 / m)
    return {16: 0.673, 32: 0.697, 64: 0.709}[m]


def _ilog2(x: np.ndarray) -> np.ndarray:
    """Exact floor(log2(x)) for uint64 x>0 (32-bit halves keep float64
    log2 exact; a direct log2 on 64-bit values can mis-round at
    power-of-two boundaries)."""
    hi = (x >> np.uint64(32)).astype(np.uint32)
    lo = x.astype(np.uint32)  # low 32 bits
    l32 = lambda v: np.floor(np.log2(np.maximum(v, 1).astype(np.float64))).astype(np.int64)
    return np.where(hi > 0, 32 + l32(hi), l32(lo))


def hll_partial(values, p: int = 14, seed: int = 42) -> np.ndarray:
    """Fold a value array into a fresh 2^p register array (uint8)."""
    m = 1 << p
    regs = np.zeros(m, dtype=np.uint8)
    arr = np.asarray(values)
    if arr.size == 0:
        return regs
    h = splitmix64(pd.util.hash_array(arr), seed)
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    w = (h << np.uint64(p)).astype(np.uint64)  # low 64-p bits, left-aligned
    # rho = leading-zero count of the (64-p)-bit suffix + 1
    rho = np.where(w == 0, np.int64(64 - p + 1), np.int64(63) - _ilog2(np.maximum(w, np.uint64(1))) + 1)
    np.maximum.at(regs, idx, rho.astype(np.uint8))
    return regs


def hll_estimate(regs: np.ndarray) -> float:
    """Estimate from a merged register array (with the standard
    small-range linear-counting correction)."""
    m = regs.size
    est = _alpha(m) * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
    zeros = int(np.count_nonzero(regs == 0))
    if est <= 2.5 * m and zeros:
        return float(m * np.log(m / zeros))
    return float(est)


def approx_distinct(ds, col: str, p: int = 14, seed: int = 42) -> float:
    """Approximate distinct count of ``ds[col]``: one stateless
    ``map_batches`` pass emits a 2^p-byte partial per batch; partials
    merge on the driver with one elementwise max (tiny: #batches × 2^p
    bytes — the sketch-merge analogue of a count() aggregate).
    Standard error ~1.04/sqrt(2^p) (~0.8% at the default p=14)."""
    m = 1 << p

    def partial(batch: pa.Table) -> pa.Table:
        vals = batch[col].to_numpy(zero_copy_only=False)
        regs = hll_partial(vals, p, seed)
        return pa.table({"regs": pa.array([regs.tobytes()], type=pa.binary())})

    merged = np.zeros(m, dtype=np.uint8)
    for b in (ds.select_columns([col])
              .map_batches(partial, batch_format="pyarrow")
              .iter_batches(batch_format="pyarrow")):
        for blob in b["regs"].to_pylist():
            merged = np.maximum(merged, np.frombuffer(blob, dtype=np.uint8))
    return hll_estimate(merged)


def count_distinct(ds, col: str) -> int:
    """Exact distinct count: per-batch local dedup (so only distinct
    values cross the exchange), then a native hash groupby. Uniform key
    distribution is the value-hash's job; no driver materialization of
    the values."""

    def local_unique(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        col_arr = batch[col].combine_chunks()
        return pa.table({col: pc.unique(col_arr)})

    return (ds.select_columns([col])
            .map_batches(local_unique, batch_format="pyarrow")
            .groupby(col).count()
            .count())
