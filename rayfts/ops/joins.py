"""Temporal joins + grouped top-k — the "as-of join / range join"
custom-operator family, expressed Ray-Data-first.

The reference engine (arso-project/sonar-tantivy) has no join operators;
these serve the training-data-pipeline role of log attribution and
stream enrichment over the ``events`` table shape
(event_id, ts, user_id, event_type, value), complementing the windowed
aggregates in ``rayfts.ops.events``.

All three operators share one distribution shape (the same one
``sessionize`` uses, chosen for 100 TB streams):

- both sides are tagged with ``part = hash(key) % num_parts`` in a
  stateless vectorized ``map_batches``, unioned, and co-located with ONE
  ``groupby(part).map_groups`` — a single all-to-all exchange keyed
  uniformly (int keys hash to themselves; the key space is assumed
  high-cardinality relative to ``num_parts``, the standard hash-join
  assumption);
- each partition is processed in ONE vectorized pass (composed-key
  ``np.lexsort`` + run detection + ``searchsorted`` / forward-fill);
  no per-row or per-key Python loop anywhere;
- pair emission in the range join is TILED (``tile_pairs``) so a hot
  key cannot materialize an unbounded pair block in a single task.

Partitioning assumption (documented, same as sessionize): one key's
rows fit one task. A pathologically hot key would need the standard
two-phase refinement (time-chunk the hot key's stream and stitch
boundary state); the uniform-hash layout here is the 100 TB default.

Timestamps are int64 epoch microseconds end-to-end so the DuckDB
oracles (``epoch_us``) reproduce every value bit-for-bit.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from rayfts.ops.events import _epoch_us


def _part_of(keys: np.ndarray, num_parts: int) -> np.ndarray:
    """Uniform partition id per key (ints hash as themselves — the test
    tables use dense int64 keys; strings go through pandas' hash)."""
    if keys.dtype.kind in "iu":
        return (keys.astype(np.uint64) % np.uint64(num_parts)).astype(np.int32)
    return (pd.util.hash_array(keys) % np.uint64(num_parts)).astype(np.int32)


def _tagged(ds, key_col: str, ts_col: str, id_col: str, side: int,
            num_parts: int):
    """Project one side to the uniform (key, ts_us, id, side, part)
    shuffle schema. Column pruning happens HERE, before the exchange —
    payload columns never cross the wide edge (re-attach them afterwards
    with a broadcast or hash join on the id)."""

    def tag(b: pa.Table) -> pa.Table:
        keys = b[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "key": pa.array(keys, type=pa.int64()),
            "ts_us": pa.array(_epoch_us(b[ts_col]), type=pa.int64()),
            "id": pa.array(
                b[id_col].to_numpy(zero_copy_only=False).astype(np.int64),
                type=pa.int64()),
            "side": pa.array(np.full(b.num_rows, side, dtype=np.int8)),
            "part": pa.array(_part_of(keys, num_parts)),
        })

    return ds.map_batches(tag, batch_format="pyarrow")


def _seg_start_per_row(keys: np.ndarray) -> np.ndarray:
    """For key-sorted ``keys``, the index where each row's key segment
    starts (vectorized run detection)."""
    n = keys.size
    is_start = np.concatenate([[True], keys[1:] != keys[:-1]])
    starts = np.flatnonzero(is_start)
    return np.repeat(starts, np.diff(np.append(starts, n)))


def _pair_seg_start(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Run-start index per row for rows sorted by the (a, b) pair."""
    n = a.size
    is_start = np.concatenate([[True], (a[1:] != a[:-1]) | (b[1:] != b[:-1])])
    starts = np.flatnonzero(is_start)
    return np.repeat(starts, np.diff(np.append(starts, n)))


def asof_join(
    left_ds,
    right_ds,
    key_col: str = "user_id",
    ts_col: str = "ts",
    left_id: str = "event_id",
    right_id: str = "event_id",
    num_parts: int = 64,
    hot_key_chunk_sec: int | None = None,
):
    """Backward-inclusive as-of join ->
    Dataset(id, key, ts_us, matched_id, matched_ts_us, lag_us).

    Each left row matches the LATEST right row of the same key with
    ``right.ts <= left.ts`` (ties on ts broken toward the larger right
    id, so the result is deterministic). Unmatched left rows are
    dropped (inner as-of).

    Per partition: one total-order lexsort by (key, ts, side, id) with
    rights before lefts at equal ts, then a single
    ``np.maximum.accumulate`` forward-fill of the last-right index; a
    match is valid iff that index falls inside the row's own key
    segment. O(n log n) per partition, zero per-row Python.

    ``hot_key_chunk_sec`` switches to the two-phase hot-key-safe plan
    (:func:`_asof_join_chunked`): partition by (key, time-chunk) instead
    of key, with a small boundary-state pre-pass — use it when a single
    key's stream can exceed one task's memory.
    """
    if hot_key_chunk_sec is not None:
        return _asof_join_chunked(
            left_ds, right_ds, key_col, ts_col, left_id, right_id,
            num_parts, int(hot_key_chunk_sec) * 1_000_000)
    lt = _tagged(left_ds, key_col, ts_col, left_id, side=1,
                 num_parts=num_parts)
    rt = _tagged(right_ds, key_col, ts_col, right_id, side=0,
                 num_parts=num_parts)

    def join_part(g: pa.Table) -> pa.Table:
        empty = pa.table({
            "id": pa.array([], type=pa.int64()),
            "key": pa.array([], type=pa.int64()),
            "ts_us": pa.array([], type=pa.int64()),
            "matched_id": pa.array([], type=pa.int64()),
            "matched_ts_us": pa.array([], type=pa.int64()),
            "lag_us": pa.array([], type=pa.int64()),
        })
        if g.num_rows == 0:
            return empty
        keys = g["key"].to_numpy(zero_copy_only=False)
        ts = g["ts_us"].to_numpy(zero_copy_only=False)
        ids = g["id"].to_numpy(zero_copy_only=False)
        side = g["side"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, side, ts, keys))
        k, t, i, s = keys[order], ts[order], ids[order], side[order]
        n = k.size
        idx = np.arange(n, dtype=np.int64)
        last_right = np.maximum.accumulate(np.where(s == 0, idx, -1))
        seg_start = _seg_start_per_row(k)
        is_left = s == 1
        m = last_right[is_left]
        valid = m >= seg_start[is_left]
        if not valid.any():
            return empty
        li = np.flatnonzero(is_left)[valid]
        m = m[valid]
        return pa.table({
            "id": pa.array(i[li], type=pa.int64()),
            "key": pa.array(k[li], type=pa.int64()),
            "ts_us": pa.array(t[li], type=pa.int64()),
            "matched_id": pa.array(i[m], type=pa.int64()),
            "matched_ts_us": pa.array(t[m], type=pa.int64()),
            "lag_us": pa.array(t[li] - t[m], type=pa.int64()),
        })

    return (lt.union(rt)
            .groupby("part")
            .map_groups(join_part, batch_format="pyarrow"))


_TS_SENTINEL = np.int64(-(1 << 62))
_GOLD = np.uint64(0x9E3779B97F4A7C15)


def _kc_part(keys: np.ndarray, chunks: np.ndarray,
             num_parts: int) -> np.ndarray:
    from rayfts.ops.sample import splitmix64

    with np.errstate(over="ignore"):
        mix = keys.astype(np.uint64) * _GOLD + chunks.astype(np.uint64)
    return (splitmix64(mix) % np.uint64(num_parts)).astype(np.int32)


def _asof_join_chunked(left_ds, right_ds, key_col, ts_col, left_id,
                       right_id, num_parts, chunk_us, key_parts: int = 32):
    """Hot-key-safe as-of join: identical results to the plain plan, but
    a single key's stream is split across time chunks so no task ever
    holds more than one (key, chunk) worth of rows.

    Two phases:

    1. **Boundary pre-pass** (small data): per (key, chunk) aggregate —
       max right (ts, id) in the chunk + a has-left flag — reduced per
       batch first (at most one row per (key, chunk) per batch crosses
       the exchange), then grouped by key so one vectorized pass
       computes, for every chunk that contains left rows, the best
       right event of all STRICTLY EARLIER chunks ("carry"). Carries
       are emitted as synthetic right rows addressed to that (key,
       chunk) partition, keeping their real (ts, id) for the output.
    2. **Main exchange**: both sides + carries partitioned by
       hash(key, chunk); the per-partition pass is the same
       lexsort + forward-fill, with (key, chunk) as the segment key
       (a carry's ts precedes the chunk's own rows, so it sorts first
       inside its segment and seeds the fill exactly like the
       predecessor rows it summarizes).

    Equivalence to the plain plan is property-tested
    (tests/test_joins.py).
    """
    CU = np.int64(chunk_us)

    def tag(side):
        def _t(b: pa.Table) -> pa.Table:
            keys = b[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
            ts = _epoch_us(b[ts_col])
            ids = (b[left_id if side == 1 else right_id]
                   .to_numpy(zero_copy_only=False).astype(np.int64))
            chunk = ts // CU
            return pa.table({
                "key": pa.array(keys, type=pa.int64()),
                "ts_us": pa.array(ts, type=pa.int64()),
                "id": pa.array(ids, type=pa.int64()),
                "side": pa.array(np.full(keys.size, side, dtype=np.int8)),
                "chunk": pa.array(chunk, type=pa.int64()),
                "part": pa.array(_kc_part(keys, chunk, num_parts)),
            })

        return _t

    lt = left_ds.map_batches(tag(1), batch_format="pyarrow")
    rt = right_ds.map_batches(tag(0), batch_format="pyarrow")
    both = lt.union(rt)

    def _carry_schema(with_kpart: bool) -> dict:
        cols = {
            "key": pa.array([], type=pa.int64()),
            "chunk": pa.array([], type=pa.int64()),
            "rts": pa.array([], type=pa.int64()),
            "rid": pa.array([], type=pa.int64()),
            "hl": pa.array([], type=pa.int8()),
        }
        if with_kpart:
            cols["kpart"] = pa.array([], type=pa.int32())
        return cols

    def boundary_partial(b: pa.Table) -> pa.Table:
        """One row per (key, chunk) in the batch: max right (ts, id)
        (sentinel if no rights) + any-left flag."""
        if b.num_rows == 0:
            return pa.table(_carry_schema(True))
        k = b["key"].to_numpy(zero_copy_only=False)
        c = b["chunk"].to_numpy(zero_copy_only=False)
        ts = b["ts_us"].to_numpy(zero_copy_only=False)
        ids = b["id"].to_numpy(zero_copy_only=False)
        s = b["side"].to_numpy(zero_copy_only=False)
        is_r = (s == 0).astype(np.int8)
        # rights sort AFTER lefts inside a (key, chunk) run, ascending by
        # (ts, id) -> the run's last row is its max right, if any
        order = np.lexsort((ids, ts, is_r, c, k))
        k, c, ts, ids, is_r = k[order], c[order], ts[order], ids[order], is_r[order]
        starts = np.flatnonzero(np.concatenate(
            [[True], (k[1:] != k[:-1]) | (c[1:] != c[:-1])]))
        last = np.append(starts[1:], k.size) - 1
        has_r = is_r[last] == 1
        return pa.table({
            "key": pa.array(k[starts], type=pa.int64()),
            "chunk": pa.array(c[starts], type=pa.int64()),
            "rts": pa.array(np.where(has_r, ts[last], _TS_SENTINEL),
                            type=pa.int64()),
            "rid": pa.array(np.where(has_r, ids[last], -1), type=pa.int64()),
            "hl": pa.array(np.maximum.reduceat(1 - is_r, starts).astype(np.int8)),
            "kpart": pa.array(_part_of(k[starts], key_parts)),
        })

    def boundary_fill(g: pa.Table) -> pa.Table:
        """All (key, chunk) aggregates of these keys -> carry rows (the
        best right of strictly earlier chunks) for every chunk that has
        left rows. Vectorized: consolidate duplicate (key, chunk) rows,
        rank rows by (rts, rid), segment-reset running max via the
        rank + seg_id*(n+1) offset trick, shift by one within the key."""
        empty = pa.table({
            "key": pa.array([], type=pa.int64()),
            "ts_us": pa.array([], type=pa.int64()),
            "id": pa.array([], type=pa.int64()),
            "side": pa.array([], type=pa.int8()),
            "chunk": pa.array([], type=pa.int64()),
            "part": pa.array([], type=pa.int32()),
        })
        if g.num_rows == 0:
            return empty
        k = g["key"].to_numpy(zero_copy_only=False)
        c = g["chunk"].to_numpy(zero_copy_only=False)
        rts = g["rts"].to_numpy(zero_copy_only=False)
        rid = g["rid"].to_numpy(zero_copy_only=False)
        hl = g["hl"].to_numpy(zero_copy_only=False)
        # consolidate per-batch partials: last of each (key, chunk) run
        # is the max (rts, rid) (sentinels sort first), flags OR-reduce
        order = np.lexsort((rid, rts, c, k))
        k, c, rts, rid, hl = (k[order], c[order], rts[order], rid[order],
                              hl[order])
        starts = np.flatnonzero(np.concatenate(
            [[True], (k[1:] != k[:-1]) | (c[1:] != c[:-1])]))
        last = np.append(starts[1:], k.size) - 1
        k, c = k[starts], c[starts]
        rts, rid = rts[last], rid[last]
        hl = np.maximum.reduceat(hl, starts)
        n = k.size
        # rows are (key, chunk)-sorted; seg_id numbers each key's run
        key_change = np.concatenate([[True], k[1:] != k[:-1]])
        seg_id = np.cumsum(key_change) - 1
        # rank rows by (rts, rid); offset by seg_id*(n+1) so a running
        # max never carries across keys (all prior-key values are smaller)
        order2 = np.lexsort((rid, rts))
        rank = np.empty(n, dtype=np.int64)
        rank[order2] = np.arange(n, dtype=np.int64)
        acc = np.maximum.accumulate(rank + seg_id * np.int64(n + 1))
        prev_acc = np.concatenate([[np.int64(-1)], acc[:-1]])
        best_prev = order2[np.maximum(prev_acc - seg_id * np.int64(n + 1), 0)]
        valid = (~key_change) & (hl == 1) & (rts[best_prev] > _TS_SENTINEL)
        idx = np.flatnonzero(valid)
        if idx.size == 0:
            return empty
        src = best_prev[idx]
        return pa.table({
            "key": pa.array(k[idx], type=pa.int64()),
            "ts_us": pa.array(rts[src], type=pa.int64()),
            "id": pa.array(rid[src], type=pa.int64()),
            "side": pa.array(np.zeros(idx.size, dtype=np.int8)),
            "chunk": pa.array(c[idx], type=pa.int64()),
            "part": pa.array(_kc_part(k[idx], c[idx], num_parts)),
        })

    carries = (both.map_batches(boundary_partial, batch_format="pyarrow")
               .groupby("kpart")
               .map_groups(boundary_fill, batch_format="pyarrow"))

    def join_part(g: pa.Table) -> pa.Table:
        empty = pa.table({
            "id": pa.array([], type=pa.int64()),
            "key": pa.array([], type=pa.int64()),
            "ts_us": pa.array([], type=pa.int64()),
            "matched_id": pa.array([], type=pa.int64()),
            "matched_ts_us": pa.array([], type=pa.int64()),
            "lag_us": pa.array([], type=pa.int64()),
        })
        if g.num_rows == 0:
            return empty
        keys = g["key"].to_numpy(zero_copy_only=False)
        ts = g["ts_us"].to_numpy(zero_copy_only=False)
        ids = g["id"].to_numpy(zero_copy_only=False)
        side = g["side"].to_numpy(zero_copy_only=False)
        chunk = g["chunk"].to_numpy(zero_copy_only=False)
        # chunk sorts BEFORE ts: a carry's real ts can fall inside an
        # earlier chunk's range when hash collisions co-locate two
        # chunks of one key in this partition
        order = np.lexsort((ids, side, ts, chunk, keys))
        k, t, i, s, c = (keys[order], ts[order], ids[order], side[order],
                         chunk[order])
        n = k.size
        idx = np.arange(n, dtype=np.int64)
        last_right = np.maximum.accumulate(np.where(s == 0, idx, -1))
        seg_start = _pair_seg_start(k, c)
        is_left = s == 1
        m = last_right[is_left]
        valid = m >= seg_start[is_left]
        if not valid.any():
            return empty
        li = np.flatnonzero(is_left)[valid]
        m = m[valid]
        return pa.table({
            "id": pa.array(i[li], type=pa.int64()),
            "key": pa.array(k[li], type=pa.int64()),
            "ts_us": pa.array(t[li], type=pa.int64()),
            "matched_id": pa.array(i[m], type=pa.int64()),
            "matched_ts_us": pa.array(t[m], type=pa.int64()),
            "lag_us": pa.array(t[li] - t[m], type=pa.int64()),
        })

    return (both.union(carries)
            .groupby("part")
            .map_groups(join_part, batch_format="pyarrow"))


def key_range_join(
    left_ds,
    right_ds,
    key_col: str = "user_id",
    ts_col: str = "ts",
    left_id: str = "event_id",
    right_id: str = "event_id",
    window_sec: int = 86400,
    num_parts: int = 64,
    tile_pairs: int = 1 << 20,
):
    """Key + time-range (interval) join ->
    Dataset(left_id, right_id, key, delta_us).

    Emits every (left, right) pair of the same key with
    ``left.ts <= right.ts < left.ts + window_sec`` (half-open window) —
    the attribution shape ("purchases within a day of a signup").

    Per partition: rights are sorted once by a composed (key-rank, ts)
    int64 key; each left row's match run is two ``searchsorted`` probes;
    pairs are expanded with the vectorized repeat/arange trick, TILED at
    ``tile_pairs`` rows so a stop-key run cannot OOM the task (same
    bounded-emission policy as simhash/ngram pair generation in
    ops/dedup.py). Raises if the composed key would overflow int64 —
    at that point normalize timestamps per partition or raise
    ``num_parts``.
    """
    W = np.int64(window_sec) * np.int64(1_000_000)
    lt = _tagged(left_ds, key_col, ts_col, left_id, side=1,
                 num_parts=num_parts)
    rt = _tagged(right_ds, key_col, ts_col, right_id, side=0,
                 num_parts=num_parts)

    def join_part(g: pa.Table) -> pa.Table:
        empty = pa.table({
            "left_id": pa.array([], type=pa.int64()),
            "right_id": pa.array([], type=pa.int64()),
            "key": pa.array([], type=pa.int64()),
            "delta_us": pa.array([], type=pa.int64()),
        })
        if g.num_rows == 0 or "key" not in g.column_names:
            return empty
        keys = g["key"].to_numpy(zero_copy_only=False)
        ts = g["ts_us"].to_numpy(zero_copy_only=False)
        ids = g["id"].to_numpy(zero_copy_only=False)
        side = g["side"].to_numpy(zero_copy_only=False)
        is_left = side == 1
        lk, lts, lid = keys[is_left], ts[is_left], ids[is_left]
        rk, rts, rid = keys[~is_left], ts[~is_left], ids[~is_left]
        if lk.size == 0 or rk.size == 0:
            return empty
        # dense key ranks over the union -> collision-free composed key
        uniq = np.unique(np.concatenate([lk, rk]))
        tmin = np.int64(min(lts.min(), rts.min()))
        span = np.int64(max(lts.max(), rts.max())) - tmin + W + np.int64(2)
        if int(uniq.size) * int(span) >= (1 << 62):
            raise ValueError(
                "key_range_join: composed (key-rank, ts) key would "
                "overflow int64 for this partition; normalize timestamps "
                "or increase num_parts")
        r_comp = np.searchsorted(uniq, rk) * span + (rts - tmin)
        r_order = np.argsort(r_comp, kind="stable")
        r_comp, rts_s, rid_s = r_comp[r_order], rts[r_order], rid[r_order]
        l_base = np.searchsorted(uniq, lk) * span + (lts - tmin)
        lo = np.searchsorted(r_comp, l_base, side="left")
        hi = np.searchsorted(r_comp, l_base + W, side="left")
        counts = hi - lo
        keep = np.flatnonzero(counts > 0)
        if keep.size == 0:
            return empty
        # tile the expansion: the repeat/arange scratch buffers are capped
        # at ~tile_pairs rows each (map_groups cannot stream multiple
        # output blocks, so the final pair table is per-partition — the
        # uniform key hash bounds that; the tile bound is what stops a
        # single hot key's expansion from spiking peak memory)
        chunks = []
        csum = np.cumsum(counts[keep])
        bounds = np.searchsorted(csum, np.arange(tile_pairs, csum[-1],
                                                 tile_pairs), side="left")
        for chunk in np.split(keep, bounds + 1):
            if chunk.size == 0:
                continue
            c = counts[chunk]
            tot = int(c.sum())
            lrep = np.repeat(chunk, c)
            offs = np.arange(tot) - np.repeat(
                np.concatenate([[0], np.cumsum(c)[:-1]]), c)
            ridx = np.repeat(lo[chunk], c) + offs
            chunks.append(pa.table({
                "left_id": pa.array(lid[lrep], type=pa.int64()),
                "right_id": pa.array(rid_s[ridx], type=pa.int64()),
                "key": pa.array(lk[lrep], type=pa.int64()),
                "delta_us": pa.array(rts_s[ridx] - lts[lrep],
                                     type=pa.int64()),
            }))
        return pa.concat_tables(chunks)

    return (lt.union(rt)
            .groupby("part")
            .map_groups(join_part, batch_format="pyarrow"))


def top_k_per_group(
    ds,
    group_col: str,
    value_col: str,
    id_col: str,
    k: int = 5,
    num_parts: int = 32,
):
    """Grouped top-k -> Dataset(<group_col>, rank, <id_col>, <value_col>).

    Keeps the ``k`` largest rows by ``value_col`` per group (ties broken
    toward the smaller id; rank is 1-based within the group).

    Two-phase, shuffle-light: every input batch is reduced to AT MOST
    ``k`` rows per group it contains (vectorized dictionary-encode +
    lexsort + run-rank), so a group crosses the exchange as
    ``k × #batches`` rows, never #rows; the per-partition finalizer
    re-runs the identical head-k pass and stamps ranks. Groups are
    spread by hash — the skew story is the combiner: even a single
    giant group arrives pre-truncated.
    """

    def schema_empty(gtype) -> pa.Table:
        return pa.table({
            group_col: pa.array([], type=gtype),
            "rank": pa.array([], type=pa.int64()),
            id_col: pa.array([], type=pa.int64()),
            value_col: pa.array([], type=pa.float64()),
            "part": pa.array([], type=pa.int32()),
        })

    def head_k(b: pa.Table, with_part: bool) -> pa.Table:
        gtype = (b.schema.field(group_col).type
                 if group_col in b.column_names else pa.string())
        if b.num_rows == 0 or group_col not in b.column_names:
            e = schema_empty(gtype)
            return e if with_part else e.drop_columns(["part"])
        denc = b[group_col].combine_chunks().dictionary_encode()
        codes = denc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        groups = np.asarray(denc.dictionary.to_pylist(), dtype=object)
        vals = b[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        ids = b[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((ids, -vals, codes))
        c = codes[order]
        seg_start = _seg_start_per_row(c)
        rank_in_group = np.arange(c.size, dtype=np.int64) - seg_start
        kept = order[rank_in_group < k]
        rank = (rank_in_group[rank_in_group < k] + 1)
        out_groups = groups[codes[kept]]
        out_arr = pa.array(out_groups.tolist(), type=gtype)
        cols = {
            group_col: out_arr,
            "rank": pa.array(rank, type=pa.int64()),
            id_col: pa.array(ids[kept], type=pa.int64()),
            value_col: pa.array(vals[kept], type=pa.float64()),
        }
        if with_part:
            # value-based, batch-independent partition hash for ANY key
            # type: strings hash directly, everything else through an
            # Arrow string cast (vectorized), so int/date keys no longer
            # break the schema or the object-array hash
            if pa.types.is_string(gtype) or pa.types.is_large_string(gtype):
                h = pd.util.hash_array(out_groups)
            else:
                h = pd.util.hash_array(
                    out_arr.cast(pa.string()).to_numpy(zero_copy_only=False))
            cols["part"] = pa.array(
                (h % np.uint64(num_parts)).astype(np.int32))
        return pa.table(cols)

    def partial(b: pa.Table) -> pa.Table:
        return head_k(b, with_part=True)

    def final(g: pa.Table) -> pa.Table:
        return head_k(g.drop_columns(["rank", "part"]), with_part=False)

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby("part")
            .map_groups(final, batch_format="pyarrow"))
