"""Sequence packing for training-data assembly: assign every document a
position in the concat-then-chunk token stream ("pack documents into
fixed token-budget training sequences", the standard LLM pre-training
layout) — built on a generic TWO-PHASE DISTRIBUTED PREFIX SUM, a
primitive Ray Data does not ship.

Semantics: documents ordered by ``id_col`` ascending form one virtual
token stream (token counts from the corpus-wide ``[\\p{L}\\p{N}]+``
tokenizer). With ``cum_before(d)`` = total tokens of all docs with
smaller id, and a per-sequence ``budget`` B:

- ``pack_id = cum_before // B`` — the training sequence the doc STARTS
  in (a doc may spill into following packs: concat-then-chunk);
- ``pack_offset = cum_before % B`` — its token offset inside that pack.

Deterministic: depends only on (ids, texts, B) — never on
partitioning, batch sizes, or execution order, so a resumed or
re-planned run packs identically (same property the samplers and HLL
guarantee).

Distributed prefix-sum plan (the classic scan decomposition):

1. **Chunk partials** (stateless pass over (id, text) only): rows are
   value-chunked by ``id // chunk_size`` — an ORDER-ALIGNED key, which
   is what makes a global running sum decomposable — and each batch
   emits one (chunk, partial_sum) row per chunk it touches. A tiny
   uniform groupby folds them; the sorted chunk totals prefix-sum on
   the driver into per-chunk starting offsets (#chunks values,
   broadcast once via ``ray.put``).
2. **Placement pass**: one uniform ``groupby(chunk).map_groups``; each
   chunk sorts its ids, local-cumsums token counts, adds the chunk's
   broadcast offset — exact global ``cum_before`` with ONE corpus
   exchange keyed uniformly (dense ids => level chunks; the id-range
   chunking is the same hot-key-safe device as the joins' time
   chunking).

The text column is scanned twice (pass 1 needs only the counts; at
scale a precomputed ``n_tokens`` column avoids the re-tokenize —
pass ``value_col`` to use one).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

__all__ = ["pack_documents"]

_TOKEN_PAT = r"[\p{L}\p{N}]+"


def _ids_counts(b: pa.Table, id_col: str, col: str | None, value_col: str | None):
    import pyarrow.compute as pc

    ids = b[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    if value_col is not None:
        nt = b[value_col].to_numpy(zero_copy_only=False).astype(np.int64)
    else:
        arr = b[col]
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        arr = pc.fill_null(arr, "")
        nt = pc.count_substring_regex(
            arr, pattern=_TOKEN_PAT).to_numpy().astype(np.int64)
    return ids, nt


def pack_documents(
    ds,
    col: str = "text",
    id_col: str = "doc_id",
    budget: int = 2048,
    chunk_size: int = 65536,
    value_col: str | None = None,
):
    """Lazy Dataset of ``(id_col, n_tokens, pack_id, pack_offset)`` (see
    module docstring). ``id_col`` must be a unique integer key; pass
    ``value_col`` to pack by a precomputed per-doc count instead of
    tokenizing ``col``."""
    import ray

    if budget <= 0 or chunk_size <= 0:
        raise ValueError(f"budget and chunk_size must be positive, got "
                         f"{budget}, {chunk_size}")

    cols = [id_col] + ([value_col] if value_col else [col])

    def partials(b: pa.Table) -> pa.Table:
        ids, nt = _ids_counts(b, id_col, col, value_col)
        chunk = ids // chunk_size
        u, inv = np.unique(chunk, return_inverse=True)
        s = np.bincount(inv, weights=nt.astype(np.float64)).astype(np.int64)
        return pa.table({"chunk": pa.array(u, type=pa.int64()),
                         "s": pa.array(s, type=pa.int64())})

    totals = (ds.select_columns(cols)
              .map_batches(partials, batch_format="pyarrow")
              .groupby("chunk").sum("s").to_pandas())
    totals = totals.sort_values("chunk")
    chunks = totals["chunk"].to_numpy().astype(np.int64)
    sums = totals["sum(s)"].to_numpy().astype(np.int64)
    offsets = np.concatenate(([0], np.cumsum(sums)[:-1]))
    off_ref = ray.put((chunks, offsets))

    def tag(b: pa.Table) -> pa.Table:
        # tokenize BEFORE the exchange and drop the text: only
        # (id, n_tokens, chunk) rows — ~24 bytes each — cross the wide
        # edge, and the corpus is never re-tokenized downstream
        ids, nt = _ids_counts(b, id_col, col, value_col)
        return pa.table({
            id_col: pa.array(ids, type=pa.int64()),
            "n_tokens": pa.array(nt, type=pa.int64()),
            "chunk": pa.array(ids // chunk_size, type=pa.int64()),
        })

    def place(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table({
                id_col: pa.array([], type=pa.int64()),
                "n_tokens": pa.array([], type=pa.int64()),
                "pack_id": pa.array([], type=pa.int64()),
                "pack_offset": pa.array([], type=pa.int64()),
            })
        chs, offs = ray.get(off_ref)
        ids = g[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        nt = g["n_tokens"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(ids, kind="stable")
        ids_s, nt_s = ids[order], nt[order]
        base = offs[np.searchsorted(chs, ids_s[0] // chunk_size)]
        cum_before = base + np.cumsum(nt_s) - nt_s
        return pa.table({
            id_col: pa.array(ids_s, type=pa.int64()),
            "n_tokens": pa.array(nt_s, type=pa.int64()),
            "pack_id": pa.array(cum_before // budget, type=pa.int64()),
            "pack_offset": pa.array(cum_before % budget, type=pa.int64()),
        })

    return (ds.select_columns(cols)
            .map_batches(tag, batch_format="pyarrow")
            .groupby("chunk")
            .map_groups(place, batch_format="pyarrow"))
