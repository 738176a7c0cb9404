"""Corpus-wide duplicate-line removal (RefinedWeb / Falcon style).

Web corpora repeat boilerplate lines (nav menus, cookie banners,
signatures) across many pages; RefinedWeb (Penedo et al. 2023, public)
and Dolma remove any line whose content recurs across documents. This
op drops every line whose STRIPPED content appears in at least
``min_docs`` distinct documents, rewriting ``text`` in place.

Conventions (identical in the SQL oracle, shared with
:mod:`rayfts.ops.repetition`):

- a LINE is a ``\\n``-separated segment; matching is on the segment
  stripped of ASCII whitespace ``" \\t\\r\\f\\v"`` on both sides;
- empty-after-strip lines never qualify and are always kept (they
  carry document structure, not content);
- a dropped line is removed together with its separator (survivors are
  re-joined with ``\\n``), and matching is EXACT string content — no
  hashing, so no collision caveat in the correctness contract.

Scale shape (SURVEY.md §4): pass 1 emits PRE-AGGREGATED per-batch
partials ``(line, occ, ndocs)`` — each document lives wholly inside one
batch, so per-batch distinct-doc counts are summable — then reduces via
the same uniform hash-partitioned Arrow ``group_by`` used by
:mod:`rayfts.ops.termstats` (a boilerplate line crossing the exchange
costs one row per batch, never one per occurrence). The qualifying set
contains ONLY duplicated lines (a vanishing fraction of corpus lines);
it broadcasts once via ``ray.put`` in byte-budgeted chunks — membership
is ``pc.is_in`` per chunk — with no fall-over needed because the chain
of chunks IS the large-set path (each chunk pins at most
``chunk_bytes`` in the object store, mirroring
``rayfts.ops.clean._semi_difference``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

_LINE_STRIP = " \t\r\f\v"


def _stripped_lines(arr: pa.Array):
    """Column of text -> (flat stripped lines, per-doc line counts)."""
    sp = pc.split_pattern(arr, pattern="\n")
    counts = pc.list_value_length(sp).to_numpy().astype(np.int64)
    flat = pc.utf8_trim(pc.list_flatten(sp), characters=_LINE_STRIP)
    return sp, flat, counts


def line_partials_batch(batch: pa.Table, col: str = "text") -> pa.Table:
    """Per-batch partial (line, occ, ndocs) for non-empty stripped lines."""
    arr = batch[col]
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if pa.types.is_null(arr.type):
        arr = arr.cast(pa.string())
    _sp, flat, counts = _stripped_lines(pc.fill_null(arr, ""))
    n = batch.num_rows
    ldoc = np.repeat(np.arange(n, dtype=np.int64), counts)
    nonempty = pc.utf8_length(flat).to_numpy().astype(np.int64) > 0
    if not nonempty.any():
        return pa.table({
            "line": pa.array([], type=pa.string()),
            "occ": pa.array([], type=pa.int64()),
            "ndocs": pa.array([], type=pa.int64()),
        })
    denc = flat.filter(pa.array(nonempty)).dictionary_encode()
    codes = denc.indices.to_numpy().astype(np.int64)
    docs = ldoc[nonempty]
    nu = len(denc.dictionary)
    occ = np.bincount(codes, minlength=nu).astype(np.int64)
    # distinct docs per line within the batch: unique (code, doc) pairs
    fused = codes * max(n, 1) + docs
    ndocs = np.bincount(np.unique(fused) // max(n, 1),
                        minlength=nu).astype(np.int64)
    return pa.table({
        "line": denc.dictionary,
        "occ": pa.array(occ, type=pa.int64()),
        "ndocs": pa.array(ndocs, type=pa.int64()),
    })


def duplicate_lines(ds, col: str = "text", min_docs: int = 2,
                    num_reducers: int = 32):
    """Lazy Dataset of ``(line, occ, ndocs)`` for every stripped line
    appearing in >= ``min_docs`` distinct documents. Stays distributed."""
    partials = ds.select_columns([col]).map_batches(
        lambda b: line_partials_batch(b, col), batch_format="pyarrow",
        batch_size=4096)

    def tag(b: pa.Table) -> pa.Table:
        h = pd.util.hash_array(b["line"].to_numpy(zero_copy_only=False))
        return b.append_column(
            "part", pa.array((h % num_reducers).astype(np.int32),
                             type=pa.int32()))

    def reduce_part(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table({"line": pa.array([], type=pa.string()),
                             "occ": pa.array([], type=pa.int64()),
                             "ndocs": pa.array([], type=pa.int64())})
        agg = (g.select(["line", "occ", "ndocs"]).group_by("line")
               .aggregate([("occ", "sum"), ("ndocs", "sum")]))
        t = pa.table({"line": agg["line"], "occ": agg["occ_sum"],
                      "ndocs": agg["ndocs_sum"]})
        return t.filter(pc.greater_equal(t["ndocs"], min_docs))

    return (partials.map_batches(tag, batch_format="pyarrow")
            .groupby("part").map_groups(reduce_part, batch_format="pyarrow"))


def line_dedup(
    ds,
    col: str = "text",
    id_col: str = "doc_id",
    min_docs: int = 2,
    chunk_bytes: int = 64 << 20,
):
    """Rewrite ``col`` dropping every line duplicated across >=
    ``min_docs`` documents; appends ``n_removed_lines``. Returns a lazy
    Dataset with the input's other columns intact.

    The duplicate-line set streams off the cluster in ``chunk_bytes``
    string chunks, each broadcast once via ``ray.put``; the rewrite pass
    ORs one vectorized ``pc.is_in`` mask per chunk. Driver memory is
    O(chunk) and object-store pinning is O(total duplicate lines) —
    duplicates only, never corpus lines.
    """
    import ray

    refs = []
    buf: list = []
    buf_bytes = 0
    for b in duplicate_lines(ds, col=col, min_docs=min_docs).iter_batches(
            batch_format="pyarrow", batch_size=1 << 18):
        vals = b["line"]
        if isinstance(vals, pa.ChunkedArray):
            vals = vals.combine_chunks()
        buf.append(vals)
        buf_bytes += vals.nbytes
        if buf_bytes >= chunk_bytes:
            refs.append(ray.put(pa.concat_arrays(buf)))
            buf, buf_bytes = [], 0
    if buf:
        refs.append(ray.put(pa.concat_arrays(buf)))

    def rewrite(batch: pa.Table) -> pa.Table:
        arr = batch[col]
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        if pa.types.is_null(arr.type):
            arr = arr.cast(pa.string())
        sp, flat, counts = _stripped_lines(pc.fill_null(arr, ""))
        raw = pc.list_flatten(sp)
        empty = pc.equal(pc.utf8_length(flat), 0).to_numpy(
            zero_copy_only=False)
        dup = np.zeros(len(flat), dtype=bool)
        for r in refs:
            dup |= pc.is_in(flat, value_set=ray.get(r)).to_numpy(
                zero_copy_only=False)
        keep = empty | ~dup
        n = batch.num_rows
        ldoc = np.repeat(np.arange(n, dtype=np.int64), counts)
        kept_counts = np.bincount(ldoc[keep], minlength=n)
        offsets = np.zeros(n + 1, dtype=np.int32)
        np.cumsum(kept_counts, out=offsets[1:])
        kept_list = pa.ListArray.from_arrays(
            pa.array(offsets), raw.filter(pa.array(keep)))
        # the separator must match the value type: binary_join has no
        # (list<large_string>, string) kernel, and big text columns are
        # legitimately large_string at scale
        sep = pa.scalar("\n", type=kept_list.type.value_type)
        new_text = pc.binary_join(kept_list, sep)
        removed = counts - kept_counts
        out = batch.drop_columns([col]).append_column(
            col, new_text.cast(arr.type))
        return out.append_column(
            "n_removed_lines", pa.array(removed, type=pa.int64()))

    return ds.map_batches(rewrite, batch_format="pyarrow")
