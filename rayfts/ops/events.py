"""Windowed / sessionized aggregates over an event stream — the
"windowed aggregate" custom-operator family, expressed Ray-Data-first
(the reference engine has no event operators; these serve the
training-data pipeline role of log bucketing and session mining over
the ``events`` table shape: (event_id, ts, user_id, event_type, value)).

Shapes (both skew-safe at stream scale, mirroring ops.termstats):

- ``tumbling_window_agg``: per-batch VECTORIZED partials (one row per
  (window, type) per batch — a hot window contributes #batches rows to
  the shuffle, never #events), then a uniform-key partitioned reduce
  with one Arrow C++ group_by per partition.
- ``sessionize``: events hash-partitioned by user (all of a user's
  events co-locate; user cardinality >> partitions keeps them level),
  one vectorized pass per partition: composed-key sort, gap detection,
  ``reduceat`` aggregates. No per-user Python loop.

Timestamps are treated as int64 epoch microseconds end-to-end so the
DuckDB oracles (``epoch_us``) reproduce values bit-for-bit.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _epoch_us(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if pa.types.is_timestamp(arr.type):
        # normalize the unit: a ns-resolution source (e.g. pandas
        # datetime64[ns]) must not leak ns values into the us domain
        arr = arr.cast(pa.timestamp("us", tz=arr.type.tz)).cast(pa.int64())
    return arr.to_numpy(zero_copy_only=False).astype(np.int64)


def tumbling_window_agg(
    ds,
    window_sec: int = 3600,
    ts_col: str = "ts",
    type_col: str = "event_type",
    value_col: str = "value",
    num_reducers: int = 32,
):
    """Tumbling-window aggregate ->
    Dataset(window_start_us, event_type, n_events, sum_value)."""
    W = np.int64(window_sec * 1_000_000)

    def partial(b: pa.Table) -> pa.Table:
        empty = pa.table({
            "window_start_us": pa.array([], type=pa.int64()),
            "event_type": pa.array([], type=pa.string()),
            "n_events": pa.array([], type=pa.int64()),
            "sum_value": pa.array([], type=pa.float64()),
            "part": pa.array([], type=pa.int32()),
        })
        if b.num_rows == 0:
            return empty
        ts = _epoch_us(b[ts_col])
        win = (ts // W) * W
        denc = b[type_col].combine_chunks().dictionary_encode()
        codes = denc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        types = np.asarray(denc.dictionary.to_pylist(), dtype=object)
        vals = b[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        # one composed-key sort groups (window, type) within the batch
        key = (win // W) * np.int64(len(types)) + codes
        order = np.argsort(key)
        k, w, c, v = key[order], win[order], codes[order], vals[order]
        starts = np.flatnonzero(np.concatenate([[True], k[1:] != k[:-1]]))
        ends = np.append(starts[1:], k.size)
        vcum = np.concatenate([[0.0], np.cumsum(v)])
        out_w = w[starts]
        out_t = types[c[starts]]
        h = (pd.util.hash_array(out_w.astype(np.uint64))
             ^ pd.util.hash_array(out_t))
        return pa.table({
            "window_start_us": pa.array(out_w, type=pa.int64()),
            "event_type": pa.array(out_t.tolist(), type=pa.string()),
            "n_events": pa.array(ends - starts, type=pa.int64()),
            "sum_value": pa.array(vcum[ends] - vcum[starts], type=pa.float64()),
            "part": pa.array((h % num_reducers).astype(np.int32)),
        })

    def reduce_part(g: pa.Table) -> pa.Table:
        agg = (g.select(["window_start_us", "event_type", "n_events", "sum_value"])
               .group_by(["window_start_us", "event_type"])
               .aggregate([("n_events", "sum"), ("sum_value", "sum")]))
        return pa.table({  # name-keyed (group_by column order varies)
            "window_start_us": agg["window_start_us"],
            "event_type": agg["event_type"],
            "n_events": agg["n_events_sum"],
            "sum_value": agg["sum_value_sum"],
        })

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("part")
        .map_groups(reduce_part, batch_format="pyarrow")
    )


def sessionize(
    ds,
    gap_sec: int = 1800,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    num_parts: int = 64,
):
    """Gap-based sessionization ->
    Dataset(user_id, session_start_us, n_events, sum_value).

    A session breaks when the within-user gap EXCEEDS ``gap_sec``.
    Events co-locate by ``hash(user) % num_parts`` (the only partitioning
    assumption: one user's events fit one task — user streams are tiny
    relative to partitions)."""
    G = np.int64(gap_sec * 1_000_000)

    def tag(b: pa.Table) -> pa.Table:
        users = b[user_col].to_numpy(zero_copy_only=False).astype(np.int64)
        t = pa.table({
            user_col: pa.array(users, type=pa.int64()),
            "__ts": pa.array(_epoch_us(b[ts_col]), type=pa.int64()),
            "__val": pa.array(
                b[value_col].to_numpy(zero_copy_only=False).astype(np.float64)),
        })
        return t.append_column(
            "part",
            pa.array((users.astype(np.uint64) % np.uint64(num_parts))
                     .astype(np.int32)))

    def sessions(g: pa.Table) -> pa.Table:
        empty = pa.table({
            user_col: pa.array([], type=pa.int64()),
            "session_start_us": pa.array([], type=pa.int64()),
            "n_events": pa.array([], type=pa.int64()),
            "sum_value": pa.array([], type=pa.float64()),
        })
        if g.num_rows == 0:
            return empty
        users = g[user_col].to_numpy(zero_copy_only=False).astype(np.int64)
        ts = g["__ts"].to_numpy(zero_copy_only=False)
        vals = g["__val"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ts, users))
        u, t, v = users[order], ts[order], vals[order]
        brk = np.concatenate(
            [[True], (u[1:] != u[:-1]) | (t[1:] - t[:-1] > G)])
        starts = np.flatnonzero(brk)
        ends = np.append(starts[1:], u.size)
        vcum = np.concatenate([[0.0], np.cumsum(v)])
        return pa.table({
            user_col: pa.array(u[starts], type=pa.int64()),
            "session_start_us": pa.array(t[starts], type=pa.int64()),
            "n_events": pa.array(ends - starts, type=pa.int64()),
            "sum_value": pa.array(vcum[ends] - vcum[starts], type=pa.float64()),
        })

    return (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("part")
        .map_groups(sessions, batch_format="pyarrow")
    )
