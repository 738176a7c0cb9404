"""Exact distributed quantiles WITHOUT a global sort.

``exact_quantiles`` finds the exact order statistics (discrete
quantiles, ``percentile_disc``/DuckDB ``quantile_disc`` semantics:
1-based rank ``max(1, ceil(q * n))`` over the sorted non-null values)
by iterative histogram refinement — the classic distributed-selection
algorithm:

1. one streaming pass for (count, min, max);
2. per iteration, ONE streaming ``map_batches`` pass bins every value
   of every still-active candidate interval into ``bins`` equal-width
   buckets; the per-batch partial is a tiny fixed-size count vector, so
   the reduce touches ``#batches x bins x #intervals`` integers, never
   the data. Each target rank then narrows to the bucket its rank falls
   in (dividing the candidate count by ~``bins``);
3. when every interval holds <= ``candidate_cap`` rows (or has
   collapsed to float resolution), one final pass collects per-batch
   ``(value, count)`` uniques inside the candidate intervals and the
   exact rank element is read off a cumulative sum.

No shuffle anywhere — a 10^12-row quantile costs ~4-5 streaming scans
with O(bins) driver state, vs. an all-to-all range sort. The driver
loop runs O(log_bins n) tiny-result iterations, which is the algorithm,
not a driver-side data loop. NaNs and NULLs are ignored (SQL aggregate
semantics); all-equal and heavy-duplicate distributions terminate via
the float-resolution guard + (value, count) collection.

``grouped_quantiles`` is the per-key variant: one uniform hash exchange
(``groupby(key).map_groups``), one vectorized sort per group. Groups
must individually fit a worker (categorical keys); for the global case
use ``exact_quantiles`` which has no such bound.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa

__all__ = ["exact_quantiles", "grouped_quantiles"]


def _col_values(b: pa.Table, col: str) -> np.ndarray:
    v = b[col].to_numpy(zero_copy_only=False).astype(np.float64)
    return v[~np.isnan(v)]


def _edges(lo: float, hi: float, bins: int) -> np.ndarray:
    """Bucket edges, computed IDENTICALLY on driver and workers so that
    bucket membership (searchsorted on the interior edges) and interval
    comparisons (``v >= edges[k]``) agree bit-exactly — the refinement
    invariant (``below`` = #values strictly below ``lo``) never drifts,
    whatever the float rounding of ``lo + k*w``."""
    # divide-then-subtract: (hi - lo) overflows to inf for huge finite
    # ranges (e.g. +/-1e308) and would poison every edge with NaN
    w = hi / bins - lo / bins
    with np.errstate(over="ignore"):
        # lo + w*k can itself overflow near k=bins for huge ranges; the
        # clip restores those edges to hi, the same on every process
        e = lo + w * np.arange(bins + 1, dtype=np.float64)
    np.clip(e, lo, hi, out=e)
    e[0], e[bins] = lo, hi
    return e


def exact_quantiles(
    ds,
    col: str,
    qs: list[float],
    bins: int = 4096,
    candidate_cap: int = 65536,
    max_iters: int = 24,
) -> pa.Table:
    """Exact ``(q, value)`` table for each q in ``qs`` (see module
    docstring for the plan). Returns an empty table when the column has
    no non-null values."""
    qs = sorted(set(float(q) for q in qs))
    if not qs or any(not (0.0 <= q <= 1.0) for q in qs):
        raise ValueError(f"qs must be within [0, 1], got {qs}")

    def stats(b: pa.Table) -> pa.Table:
        v = _col_values(b, col)
        fin = v[np.isfinite(v)]
        return pa.table({
            "cnt": pa.array([v.size], type=pa.int64()),
            "nneg": pa.array([int((v == -math.inf).sum())], type=pa.int64()),
            "npos": pa.array([int((v == math.inf).sum())], type=pa.int64()),
            "mn": pa.array([float(fin.min()) if fin.size else math.inf]),
            "mx": pa.array([float(fin.max()) if fin.size else -math.inf]),
        })

    parts = ds.map_batches(stats, batch_format="pyarrow").to_pandas()
    n = int(parts["cnt"].sum())
    if n == 0:
        return pa.table({"q": pa.array([], type=pa.float64()),
                         "value": pa.array([], type=pa.float64())})
    # +/-inf are ordered values (quantile_disc agrees): ranks in the
    # -inf head / +inf tail resolve immediately; the refinement loop
    # only ever sees the finite range
    n_neg = int(parts["nneg"].sum())
    n_pos = int(parts["npos"].sum())
    lo0, hi0 = float(parts["mn"].min()), float(parts["mx"].max())
    # per-target state: 1-based rank, candidate interval, count below lo
    ranks = [max(1, math.ceil(q * n)) for q in qs]
    state = []
    for r in ranks:
        if r <= n_neg:
            state.append({"lo": math.inf, "hi": -math.inf, "below": 0,
                          "cnt_in": 0, "resolved": -math.inf})
        elif r > n - n_pos:
            state.append({"lo": math.inf, "hi": -math.inf, "below": 0,
                          "cnt_in": 0, "resolved": math.inf})
        else:
            state.append({"lo": lo0, "hi": hi0, "below": n_neg,
                          "cnt_in": n - n_neg - n_pos, "resolved": None})

    def active(s) -> bool:
        if s["resolved"] is not None or s["cnt_in"] <= candidate_cap:
            return False
        w = s["hi"] / bins - s["lo"] / bins
        # float-resolution guard: bins no longer subdivide the interval
        return w > 0 and s["lo"] + w > s["lo"]

    for _ in range(max_iters):
        act = [i for i, s in enumerate(state) if active(s)]
        if not act:
            break
        # dedupe identical intervals so shared work is computed once
        uniq: dict[tuple[float, float], int] = {}
        for i in act:
            uniq.setdefault((state[i]["lo"], state[i]["hi"]), len(uniq))
        ivals = sorted(uniq, key=uniq.get)
        los = np.array([iv[0] for iv in ivals])
        his = np.array([iv[1] for iv in ivals])

        def hist(b: pa.Table, los=los, his=his) -> pa.Table:
            v = _col_values(b, col)
            out = np.zeros((los.size, bins), dtype=np.int64)
            for j in range(los.size):
                lo, hi = los[j], his[j]
                sel = v[(v >= lo) & (v <= hi)]
                if sel.size:
                    e = _edges(lo, hi, bins)
                    k = np.searchsorted(e[1:bins], sel, side="right")
                    out[j] = np.bincount(k, minlength=bins)
            return pa.table({
                "j": pa.array(np.arange(los.size, dtype=np.int64)),
                "h": pa.array(list(out), type=pa.list_(pa.int64())),
            })

        hp = ds.map_batches(hist, batch_format="pyarrow").to_pandas()
        totals = np.zeros((los.size, bins), dtype=np.int64)
        for j, h in zip(hp["j"].to_numpy(), hp["h"]):
            totals[j] += np.asarray(h, dtype=np.int64)
        for i in act:
            s = state[i]
            j = uniq[(s["lo"], s["hi"])]
            cum = np.cumsum(totals[j])
            # bucket whose cumulative count first reaches the local rank
            local_r = ranks[i] - s["below"]
            k = int(np.searchsorted(cum, local_r, side="left"))
            e = _edges(s["lo"], s["hi"], bins)
            s["below"] += int(cum[k - 1]) if k > 0 else 0
            s["cnt_in"] = int(totals[j][k])
            s["lo"], s["hi"] = float(e[k]), float(e[k + 1])

    los = np.array([s["lo"] for s in state])
    his = np.array([s["hi"] for s in state])

    def collect(b: pa.Table, los=los, his=his) -> pa.Table:
        v = _col_values(b, col)
        js, vals, cnts = [], [], []
        for j in range(los.size):
            sel = v[(v >= los[j]) & (v <= his[j])]
            if sel.size:
                u, c = np.unique(sel, return_counts=True)
                js.append(np.full(u.size, j, dtype=np.int64))
                vals.append(u)
                cnts.append(c.astype(np.int64))
        if not js:
            return pa.table({"j": pa.array([], type=pa.int64()),
                             "v": pa.array([], type=pa.float64()),
                             "c": pa.array([], type=pa.int64())})
        return pa.table({"j": pa.array(np.concatenate(js)),
                         "v": pa.array(np.concatenate(vals)),
                         "c": pa.array(np.concatenate(cnts))})

    cp = ds.map_batches(collect, batch_format="pyarrow").to_pandas()
    out_vals = []
    for i, s in enumerate(state):
        if s["resolved"] is not None:
            out_vals.append(s["resolved"])
            continue
        sub = cp[cp["j"] == i]
        grp = sub.groupby("v", sort=True)["c"].sum()
        cum = grp.cumsum().to_numpy()
        local_r = ranks[i] - s["below"]
        k = int(np.searchsorted(cum, local_r, side="left"))
        out_vals.append(float(grp.index[k]))
    return pa.table({"q": pa.array(qs, type=pa.float64()),
                     "value": pa.array(out_vals, type=pa.float64())})


def grouped_quantiles(
    ds,
    key: str,
    col: str,
    qs: list[float],
):
    """Lazy Dataset of ``(key, q, value)``: exact discrete quantiles per
    group (same rank convention as :func:`exact_quantiles`). One uniform
    hash exchange; one vectorized sort per group."""
    qs = sorted(set(float(q) for q in qs))
    if not qs or any(not (0.0 <= q <= 1.0) for q in qs):
        raise ValueError(f"qs must be within [0, 1], got {qs}")
    qarr = np.array(qs, dtype=np.float64)

    def per_group(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table({key: g[key].slice(0, 0),
                             "q": pa.array([], type=pa.float64()),
                             "value": pa.array([], type=pa.float64())})
        v = _col_values(g, col)
        if v.size == 0:
            # SQL semantics: a group whose values are all NULL still
            # exists, with NULL quantiles (quantile_disc + GROUP BY)
            key_val = g[key][0].as_py()
            return pa.table({
                key: pa.array([key_val] * len(qs),
                              type=g.schema.field(key).type),
                "q": pa.array(qarr),
                "value": pa.array([None] * len(qs), type=pa.float64()),
            })
        v.sort()
        idx = np.maximum(np.ceil(qarr * v.size).astype(np.int64), 1) - 1
        key_val = g[key][0].as_py()
        return pa.table({
            key: pa.array([key_val] * len(qs),
                          type=g.schema.field(key).type),
            "q": pa.array(qarr),
            "value": pa.array(v[idx]),
        })

    return ds.select_columns([key, col]).groupby(key).map_groups(
        per_group, batch_format="pyarrow")
