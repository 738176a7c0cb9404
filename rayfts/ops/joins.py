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


def asof_join(
    left_ds,
    right_ds,
    key_col: str = "user_id",
    ts_col: str = "ts",
    left_id: str = "event_id",
    right_id: str = "event_id",
    num_parts: int = 64,
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
    """
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

    def schema_empty() -> pa.Table:
        return pa.table({
            group_col: pa.array([], type=pa.string()),
            "rank": pa.array([], type=pa.int64()),
            id_col: pa.array([], type=pa.int64()),
            value_col: pa.array([], type=pa.float64()),
            "part": pa.array([], type=pa.int32()),
        })

    def head_k(b: pa.Table, with_part: bool) -> pa.Table:
        if b.num_rows == 0:
            return (schema_empty() if with_part
                    else schema_empty().drop_columns(["part"]))
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
        cols = {
            group_col: pa.array(out_groups.tolist(), type=pa.string()),
            "rank": pa.array(rank, type=pa.int64()),
            id_col: pa.array(ids[kept], type=pa.int64()),
            value_col: pa.array(vals[kept], type=pa.float64()),
        }
        if with_part:
            h = pd.util.hash_array(out_groups)
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
