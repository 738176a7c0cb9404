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
    hot_user_chunk_sec: int | None = None,
):
    """Gap-based sessionization ->
    Dataset(user_id, session_start_us, n_events, sum_value).

    A session breaks when the within-user gap EXCEEDS ``gap_sec``.
    Events co-locate by ``hash(user) % num_parts`` (the only partitioning
    assumption: one user's events fit one task — user streams are tiny
    relative to partitions).

    ``hot_user_chunk_sec`` switches to the two-phase hot-user-safe plan
    (:func:`_sessionize_chunked`): partition by (user, time-chunk), emit
    per-chunk session SUMMARIES, and stitch boundary-crossing sessions
    in a second small pass — use it when one user's stream can exceed a
    task's memory."""
    if hot_user_chunk_sec is not None:
        return _sessionize_chunked(
            ds, gap_sec, user_col, ts_col, value_col, num_parts,
            int(hot_user_chunk_sec) * 1_000_000)
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


def _sessionize_chunked(ds, gap_sec, user_col, ts_col, value_col,
                        num_parts, chunk_us, key_parts: int = 32):
    """Hot-user-safe sessionization: identical results to the plain
    plan, with no task ever holding more than one (user, time-chunk) of
    raw events.

    1. **Local pass**: partition by hash(user, chunk); each task
       sessionizes its chunk and emits one SUMMARY row per local
       session (user, start_us, end_us, n, sum). Sessions are confined
       to their chunk, so summaries of one user occupy disjoint time
       ranges — the data volume drops from #events to #sessions here.
    2. **Stitch pass** (small data): summaries grouped by hash(user);
       one vectorized pass sorts by (user, start) and MERGES adjacent
       summaries whose gap (next.start - prev.end) is within
       ``gap_sec`` — exactly the boundary-crossing sessions, including
       chains spanning many chunks (cumsum over break flags). Two
       sessions from the same chunk never merge (their local gap
       already exceeded the threshold), so stitching is pure
       re-aggregation, never re-splitting.
    """
    G = np.int64(gap_sec * 1_000_000)
    CU = np.int64(chunk_us)

    def tag(b: pa.Table) -> pa.Table:
        from rayfts.ops.joins import _kc_part

        users = b[user_col].to_numpy(zero_copy_only=False).astype(np.int64)
        ts = _epoch_us(b[ts_col])
        chunk = ts // CU
        return pa.table({
            user_col: pa.array(users, type=pa.int64()),
            "__ts": pa.array(ts, type=pa.int64()),
            "__val": pa.array(
                b[value_col].to_numpy(zero_copy_only=False)
                .astype(np.float64)),
            "part": pa.array(_kc_part(users, chunk, num_parts)),
        })

    def _summary_empty() -> pa.Table:
        return pa.table({
            user_col: pa.array([], type=pa.int64()),
            "start_us": pa.array([], type=pa.int64()),
            "end_us": pa.array([], type=pa.int64()),
            "n_events": pa.array([], type=pa.int64()),
            "sum_value": pa.array([], type=pa.float64()),
            "kpart": pa.array([], type=pa.int32()),
        })

    def local_sessions(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return _summary_empty()
        users = g[user_col].to_numpy(zero_copy_only=False)
        ts = g["__ts"].to_numpy(zero_copy_only=False)
        vals = g["__val"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ts, users))
        u, t, v = users[order], ts[order], vals[order]
        # ALWAYS break at chunk boundaries, even when the cross-chunk gap
        # is small: a task can hold NON-adjacent chunks of one user
        # (hash spread), and pre-merging those would emit overlapping
        # summaries that defeat the stitch pass's prev-row gap test.
        # Chunk-confined summaries are disjoint, so the stitch is exact.
        c = t // CU
        brk = np.concatenate(
            [[True],
             (u[1:] != u[:-1]) | (c[1:] != c[:-1]) | (t[1:] - t[:-1] > G)])
        starts = np.flatnonzero(brk)
        ends = np.append(starts[1:], u.size)
        vcum = np.concatenate([[0.0], np.cumsum(v)])
        su = u[starts]
        return pa.table({
            user_col: pa.array(su, type=pa.int64()),
            "start_us": pa.array(t[starts], type=pa.int64()),
            "end_us": pa.array(t[ends - 1], type=pa.int64()),
            "n_events": pa.array(ends - starts, type=pa.int64()),
            "sum_value": pa.array(vcum[ends] - vcum[starts],
                                  type=pa.float64()),
            "kpart": pa.array((su.astype(np.uint64)
                               % np.uint64(key_parts)).astype(np.int32)),
        })

    def stitch(g: pa.Table) -> pa.Table:
        empty = pa.table({
            user_col: pa.array([], type=pa.int64()),
            "session_start_us": pa.array([], type=pa.int64()),
            "n_events": pa.array([], type=pa.int64()),
            "sum_value": pa.array([], type=pa.float64()),
        })
        if g.num_rows == 0:
            return empty
        u = g[user_col].to_numpy(zero_copy_only=False)
        s = g["start_us"].to_numpy(zero_copy_only=False)
        e = g["end_us"].to_numpy(zero_copy_only=False)
        n = g["n_events"].to_numpy(zero_copy_only=False)
        v = g["sum_value"].to_numpy(zero_copy_only=False)
        order = np.lexsort((s, u))
        u, s, e, n, v = u[order], s[order], e[order], n[order], v[order]
        prev_end = np.concatenate([[np.int64(-(1 << 62))], e[:-1]])
        brk = np.concatenate([[True], u[1:] != u[:-1]]) | (s - prev_end > G)
        starts = np.flatnonzero(brk)
        ends = np.append(starts[1:], u.size)
        ncum = np.concatenate([[0], np.cumsum(n)])
        vcum = np.concatenate([[0.0], np.cumsum(v)])
        return pa.table({
            user_col: pa.array(u[starts], type=pa.int64()),
            "session_start_us": pa.array(s[starts], type=pa.int64()),
            "n_events": pa.array(ncum[ends] - ncum[starts], type=pa.int64()),
            "sum_value": pa.array(vcum[ends] - vcum[starts],
                                  type=pa.float64()),
        })

    return (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("part")
        .map_groups(local_sessions, batch_format="pyarrow")
        .groupby("kpart")
        .map_groups(stitch, batch_format="pyarrow")
    )
