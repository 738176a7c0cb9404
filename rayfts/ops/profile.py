"""Column profiling aggregates — the "describe your table before you
train on it" stage: per-group moments (count / sum / mean / variance)
and per-group exact distinct counts, both as pre-aggregated mergeable
partials so a hot group crosses the exchange as one row per batch.

- ``grouped_moments``: per-batch (count, sum, sum of squares) partials
  — the textbook mergeable moment sketch — folded by ONE uniform-key
  groupby; mean/variance derive on the reduced rows. Sums are exact
  integer-cent arithmetic when ``scale`` is set (value * scale rounded
  half-even to int64), which is what makes mean/var SQL-oracle
  comparable despite float input.
- ``grouped_distinct``: per-batch LOCAL uniques (one row per distinct
  (group, value) per batch) -> uniform groupby on the pair -> tiny
  per-group count; the exchange carries distinct pairs, never raw rows
  (same shape as ``count_distinct`` in ops/sketch.py, per group).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

__all__ = ["grouped_moments", "grouped_distinct"]


def grouped_moments(ds, key: str, col: str, scale: int = 100):
    """Lazy Dataset of ``(key, cnt, sum_scaled, sumsq_scaled)`` — the
    exact integer moment partials per group (value scaled by ``scale``
    and rounded half-even; nulls/NaNs ignored). Mean and variance are
    one division away; keeping the output integer-exact is what makes
    it hash-oracle comparable."""
    if scale <= 0:
        raise ValueError(f"scale must be positive, got {scale}")

    def partial(b: pa.Table) -> pa.Table:
        k = b[key].to_numpy(zero_copy_only=False)
        v = b[col].to_numpy(zero_copy_only=False).astype(np.float64)
        ok = ~np.isnan(v)
        k, v = k[ok], v[ok]
        sv = np.round(v * scale).astype(np.int64)
        uk, inv = np.unique(k, return_inverse=True)
        cnt = np.bincount(inv).astype(np.int64)
        # accumulate in int64 (np.add.at), NOT float64 bincount weights —
        # float64 partials silently lose precision past 2^53 per
        # batch-group; int64 keeps the documented exact contract up to
        # int64 range (overflow there raises loudly in numpy >= 2)
        s = np.zeros(uk.size, np.int64)
        np.add.at(s, inv, sv)
        sq = np.zeros(uk.size, np.int64)
        np.add.at(sq, inv, sv * sv)
        return pa.table({
            key: pa.array(uk),
            "cnt_p": pa.array(cnt),
            "sum_p": pa.array(s),
            "sumsq_p": pa.array(sq),
        })

    agg = (ds.select_columns([key, col])
           .map_batches(partial, batch_format="pyarrow")
           .groupby(key).sum(["cnt_p", "sum_p", "sumsq_p"]))

    def finish(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "sum(cnt_p)" not in b.column_names:
            return pa.table({key: pa.array([], type=pa.string()),
                             "cnt": pa.array([], type=pa.int64()),
                             "sum_scaled": pa.array([], type=pa.int64()),
                             "sumsq_scaled": pa.array([], type=pa.int64())})
        return pa.table({
            key: b[key],
            "cnt": b["sum(cnt_p)"],
            "sum_scaled": b["sum(sum_p)"],
            "sumsq_scaled": b["sum(sumsq_p)"],
        })

    return agg.map_batches(finish, batch_format="pyarrow")


def grouped_distinct(ds, key: str, col: str):
    """Lazy Dataset of ``(key, n_distinct)`` — exact distinct ``col``
    values per group. Only distinct (key, value) pairs cross the
    exchange (local per-batch dedup first)."""

    def local_pairs(b: pa.Table) -> pa.Table:
        k = b[key].to_numpy(zero_copy_only=False)
        v = b[col].to_numpy(zero_copy_only=False)
        df = pd.DataFrame({key: k, col: v}).drop_duplicates()
        df = df[~df[col].isna()]
        return pa.Table.from_pandas(df, preserve_index=False)

    pairs = (ds.select_columns([key, col])
             .map_batches(local_pairs, batch_format="pyarrow")
             .groupby([key, col]).count())

    def per_group(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or key not in b.column_names:
            return pa.table({key: pa.array([], type=pa.string()),
                             "nd_p": pa.array([], type=pa.int64())})
        k = b[key].to_numpy(zero_copy_only=False)
        uk, inv = np.unique(k, return_inverse=True)
        nd = np.bincount(inv).astype(np.int64)
        return pa.table({key: pa.array(uk), "nd_p": pa.array(nd)})

    agg = (pairs.map_batches(per_group, batch_format="pyarrow")
           .groupby(key).sum("nd_p"))

    def finish(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "sum(nd_p)" not in b.column_names:
            return pa.table({key: pa.array([], type=pa.string()),
                             "n_distinct": pa.array([], type=pa.int64())})
        return pa.table({key: b[key], "n_distinct": b["sum(nd_p)"]})

    return agg.map_batches(finish, batch_format="pyarrow")
