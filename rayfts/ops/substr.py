"""Exact duplicated-substring span detection over a document corpus —
the "dedup repeated text, not just repeated documents" operator from the
training-data-cleaning literature (Lee et al. 2021, "Deduplicating
Training Data Makes Language Models Better", arXiv:2107.06499 — their
suffix-array ExactSubstr; here re-expressed distributed-first as an
L-token rolling-hash window sweep, the standard scalable equivalent).

Semantics (token coordinates; tokenizer = the corpus-wide RE2 split on
``[^\\p{L}\\p{N}]+`` + lowercase that every dedup/textstats op in this
package shares): an L-token window is *duplicated* when the same L-gram
occurs in >= 2 distinct documents (``scope="cross_doc"``) or >= 2 times
anywhere including within one doc (``scope="any"``). Per document, the
duplicated windows are merged into maximal half-open spans
``[span_start, span_end)`` (overlapping or touching windows fuse).
Documents shorter than L tokens produce no windows.

Distributed plan — TWO STREAMING PASSES, no corpus-sized shuffle, and
no hot-key hazard (a window repeated 10^9 times never co-locates):

1. **Qualify pass**: each batch emits ONE pre-aggregated row per
   distinct window hash — ``(h, min_doc, max_doc, cnt, part)``. The
   trick making this exact: "seen in >= 2 distinct docs" is decidable
   from ``min_doc != max_doc``, and min/max/sum are associative, so a
   summary-sized uniform-key groupby yields the exact qualifying hash
   set. A boilerplate window repeated everywhere contributes one row
   per batch, the same pre-aggregation rule as term_stats.
2. **Emit pass**: re-scan the corpus, recompute each batch's windows,
   and probe the qualifying set — broadcast (``ray.put`` of a sorted
   int64 array, read once per actor in ``__init__``) when it fits
   ``broadcast_limit``, else a partitioned inner join (the join path
   re-introduces hash co-location for the qualifying rows only — the
   documented fall-over cost at extreme duplication rates). Surviving
   ``(doc, pos)`` rows — OUTPUT-sized, not corpus-sized — take one
   uniform ``hash(doc)`` exchange for the per-doc gaps-and-islands
   span merge.

Window equality is 64-bit rolling-hash equality: a collision could mark
a span the string oracle would not (probability ~n^2/2^65; negligible
at any tested scale, documented honestly here).

Reference parity note: the reference engine (arso-project/sonar-tantivy)
has no substring dedup — this op is part of the prompt-mandated
LLM-pipeline extension set, not §2 parity.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from rayfts.ops._stagecache import call_cached
from rayfts.ops.dedup import _ShingleStage, _poly_powers
from rayfts.ops.pjoin import semi_join_partitioned

__all__ = [
    "WindowHashes",
    "duplicated_spans",
    "dup_span_stats",
]


def _doc_part(ids: np.ndarray, num_parts: int) -> np.ndarray:
    return (pd.util.hash_array(ids.astype(np.int64))
            % np.uint64(num_parts)).astype(np.int32)


class WindowHashes(_ShingleStage):
    """Stage over full L-token windows, run as a stateless task pool
    with one cached instance per worker process (``_stagecache``).
    Three modes:

    - ``mode="partials"``: one row per DISTINCT window hash per batch —
      ``(h, mn, mx, cnt, part)`` (the qualify-pass pre-aggregation);
    - ``mode="rows"``: one row per window — ``(h, doc, pos)``;
    - ``mode="probe"``: one ``(doc, pos, dpart)`` row per window whose
      hash is in the broadcast qualifying set (``qual_ref``), fetched
      ONCE per worker process.

    Tokenization, the bounded per-unique-token md5 cache, and the
    polynomial window hash are shared with the shingle stages via
    :class:`_ShingleStage`."""

    def __init__(self, col: str = "text", id_col: str = "doc_id",
                 min_len: int = 20, num_parts: int = 64,
                 mode: str = "partials", qual_ref=None,
                 cache_cap: int | None = None):
        super().__init__(k=min_len, cache_cap=cache_cap)
        self.col = col
        self.id_col = id_col
        self.num_parts = num_parts
        self.mode = mode
        self._powers = _poly_powers(min_len)
        self._qual = None
        if mode == "probe":
            import ray

            self._qual = np.sort(ray.get(qual_ref))

    def _windows(self, batch: pa.Table):
        """(h int64, doc_ids int64, pos int64) for every full window."""
        L = self.k
        tok_h, doc_idx, n = self._hashed_token_stream(batch[self.col])
        if tok_h.size >= L:
            win = np.lib.stride_tricks.sliding_window_view(tok_h, L)
            with np.errstate(over="ignore"):
                h_all = (win * self._powers).sum(axis=1, dtype=np.uint64)
            w_docs = doc_idx[: doc_idx.size - L + 1]
            valid = w_docs == doc_idx[L - 1:]  # window fully inside one doc
            # shift keeps int64-representable while preserving equality
            h = (h_all[valid] >> np.uint64(1)).astype(np.int64)
            d = w_docs[valid]
            g_idx = np.flatnonzero(valid)
            tok_counts = np.bincount(doc_idx, minlength=n)
            doc_start = np.concatenate(([0], np.cumsum(tok_counts)[:-1]))
            pos = (g_idx - doc_start[d]).astype(np.int64)
        else:
            h = np.empty(0, np.int64)
            d = np.empty(0, np.int64)
            pos = np.empty(0, np.int64)
        ids = batch[self.id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return h, ids[d] if d.size else np.empty(0, np.int64), pos

    def __call__(self, batch: pa.Table) -> pa.Table:
        h, d, pos = self._windows(batch)
        if self.mode == "rows":
            return pa.table({
                "h": pa.array(h),
                self.id_col: pa.array(d, type=pa.int64()),
                "pos": pa.array(pos),
            })
        if self.mode == "probe":
            q = self._qual
            if h.size and q.size:
                ix = np.clip(np.searchsorted(q, h), 0, q.size - 1)
                keep = q[ix] == h
                d, pos = d[keep], pos[keep]
            else:
                d = np.empty(0, np.int64)
                pos = np.empty(0, np.int64)
            return pa.table({
                self.id_col: pa.array(d, type=pa.int64()),
                "pos": pa.array(pos),
                "dpart": pa.array(_doc_part(d, self.num_parts)),
            })
        # partials: per-batch (h, min_doc, max_doc, cnt)
        if h.size:
            order = np.lexsort((d, h))
            hs, ds_ = h[order], d[order]
            new = np.concatenate(([True], hs[1:] != hs[:-1]))
            starts = np.flatnonzero(new)
            hu = hs[starts]
            mn = np.minimum.reduceat(ds_, starts)
            mx = np.maximum.reduceat(ds_, starts)
            cnt = np.diff(np.concatenate((starts, [hs.size])))
        else:
            hu = np.empty(0, np.int64)
            mn = mx = np.empty(0, np.int64)
            cnt = np.empty(0, np.int64)
        return pa.table({
            "h": pa.array(hu),
            "mn": pa.array(mn, type=pa.int64()),
            "mx": pa.array(mx, type=pa.int64()),
            "cnt": pa.array(cnt.astype(np.int64)),
            "part": pa.array((hu.astype(np.uint64)
                              % np.uint64(self.num_parts)).astype(np.int32)),
        })


def _qualify(g: pa.Table, cross_doc: bool) -> pa.Table:
    """One hash partition of window PARTIALS -> the qualifying hashes.
    min/max/sum fold associatively across batch partials, so the
    cross-doc test is exact without ever co-locating window rows."""
    if g.num_rows == 0:
        return pa.table({"h": pa.array([], type=pa.int64())})
    h = g["h"].to_numpy(zero_copy_only=False)
    mn = g["mn"].to_numpy(zero_copy_only=False)
    mx = g["mx"].to_numpy(zero_copy_only=False)
    cnt = g["cnt"].to_numpy(zero_copy_only=False)
    order = np.argsort(h, kind="stable")
    h, mn, mx, cnt = h[order], mn[order], mx[order], cnt[order]
    new = np.concatenate(([True], h[1:] != h[:-1]))
    starts = np.flatnonzero(new)
    hu = h[starts]
    if cross_doc:
        g_mn = np.minimum.reduceat(mn, starts)
        g_mx = np.maximum.reduceat(mx, starts)
        qual = g_mx > g_mn
    else:
        qual = np.add.reduceat(cnt, starts) >= 2
    return pa.table({"h": pa.array(hu[qual])})


def _merge_spans(g: pa.Table, id_col: str, L: int) -> pa.Table:
    """One doc partition of kept window rows -> merged half-open token
    spans per doc. Vectorized gaps-and-islands: with equal-length windows
    an island breaks exactly where the start gap exceeds L."""
    if g.num_rows == 0:
        return pa.table({id_col: pa.array([], type=pa.int64()),
                         "span_start": pa.array([], type=pa.int64()),
                         "span_end": pa.array([], type=pa.int64())})
    d = g[id_col].to_numpy(zero_copy_only=False)
    p = g["pos"].to_numpy(zero_copy_only=False)
    order = np.lexsort((p, d))
    d, p = d[order], p[order]
    brk = np.concatenate(
        ([True], (d[1:] != d[:-1]) | (p[1:] - p[:-1] > L)))
    starts = np.flatnonzero(brk)
    span_start = p[starts]
    ends = np.concatenate((starts[1:] - 1, [p.size - 1]))
    span_end = p[ends] + L
    return pa.table({
        id_col: pa.array(d[starts], type=pa.int64()),
        "span_start": pa.array(span_start, type=pa.int64()),
        "span_end": pa.array(span_end, type=pa.int64()),
    })


def duplicated_spans(
    ds,
    col: str = "text",
    id_col: str = "doc_id",
    min_len: int = 20,
    scope: str = "cross_doc",
    num_parts: int = 64,
    broadcast_limit: int = 5_000_000,
    num_partitions: int | None = None,
    concurrency: int | tuple | None = None,
):
    """Lazy Dataset of ``(id_col, span_start, span_end)`` — maximal
    duplicated-substring token spans per document (see module docstring
    for semantics and the two-pass distributed plan)."""
    import ray

    if scope not in ("cross_doc", "any"):
        raise ValueError(f"scope must be 'cross_doc' or 'any', got {scope!r}")
    # default = stateless task pool (per-process instance cache); pass an
    # int concurrency only to CAP task parallelism
    base_kwargs = {"col": col, "id_col": id_col, "min_len": min_len,
                   "num_parts": num_parts}

    stage_kwargs = dict(batch_format="pyarrow", batch_size=4096)
    if concurrency is not None:
        stage_kwargs["concurrency"] = concurrency
    partials = ds.map_batches(
        call_cached,
        fn_kwargs={"_cls": WindowHashes, **base_kwargs, "mode": "partials"},
        **stage_kwargs,
    )
    # summary-sized and output-bounded: materialized once, read twice
    # (plan choice + probe/join input)
    qual = partials.groupby("part").map_groups(
        lambda g: _qualify(g, scope == "cross_doc"),
        batch_format="pyarrow",
    ).materialize()

    n_qual = qual.count()
    if n_qual <= broadcast_limit:
        chunks = [b["h"].to_numpy(zero_copy_only=False)
                  for b in qual.iter_batches(batch_format="pyarrow")]
        qual_ref = ray.put(np.concatenate(chunks)
                           if chunks else np.empty(0, np.int64))
        hits = ds.map_batches(
            call_cached,
            fn_kwargs={"_cls": WindowHashes, **base_kwargs, "mode": "probe",
                       "qual_ref": qual_ref},
            **stage_kwargs,
        )
    else:
        rows = ds.map_batches(
            call_cached,
            fn_kwargs={"_cls": WindowHashes, **base_kwargs, "mode": "rows"},
            **stage_kwargs,
        )
        # join-free membership filter: one uniform sort-groupby exchange of
        # the window rows against the (output-bounded) qualifying hashes
        joined = semi_join_partitioned(
            rows, qual, left_key="h", right_key="h",
            left_schema={"h": pa.int64(), id_col: pa.int64(),
                         "pos": pa.int64()},
            num_parts=num_partitions or 64,
        )

        def tag_doc(b: pa.Table) -> pa.Table:
            ids = b[id_col].to_numpy(zero_copy_only=False)
            return pa.table({
                id_col: b[id_col],
                "pos": b["pos"],
                "dpart": pa.array(_doc_part(ids, num_parts)),
            })

        hits = joined.map_batches(tag_doc, batch_format="pyarrow")

    return hits.groupby("dpart").map_groups(
        lambda g: _merge_spans(g, id_col, min_len),
        batch_format="pyarrow",
    )


def dup_span_stats(
    ds,
    col: str = "text",
    id_col: str = "doc_id",
    min_len: int = 20,
    scope: str = "cross_doc",
    num_parts: int = 64,
    concurrency: int | tuple | None = None,
):
    """Per-document duplication stats: ``(id_col, n_tokens, dup_tokens)``
    for EVERY document (0 for docs without duplicated spans). Integer
    columns only, so the result is exactly SQL-oracle comparable;
    ``dup_frac = dup_tokens / n_tokens`` is left to the consumer.

    Plan: the span pipeline above, then — instead of a join — a
    schema-aligned UNION of the (doc, n_tokens, dup=0) scan with the
    (doc, 0, span_len) rows, folded by ONE uniform ``groupby(doc)``
    sum. Each doc contributes exactly one count row, so the sums are
    the per-doc stats directly; docs without spans fall out at 0 with
    no outer-join machinery. Used as a corpus-cleaning gate (drop docs
    whose duplicated fraction exceeds a budget)."""
    spans = duplicated_spans(ds, col, id_col, min_len=min_len, scope=scope,
                             num_parts=num_parts, concurrency=concurrency)

    def span_lengths(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "span_end" not in b.column_names:
            # empty map_groups partitions can arrive schema-less
            return pa.table({id_col: pa.array([], type=pa.int64()),
                             "nt_p": pa.array([], type=pa.int64()),
                             "dup_p": pa.array([], type=pa.int64())})
        lens = (b["span_end"].to_numpy(zero_copy_only=False)
                - b["span_start"].to_numpy(zero_copy_only=False))
        return pa.table({
            id_col: b[id_col],
            "nt_p": pa.array(np.zeros(b.num_rows, np.int64)),
            "dup_p": pa.array(lens, type=pa.int64()),
        })

    def tok_counts(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        arr = b[col]
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        arr = pc.fill_null(arr, "")
        nt = pc.count_substring_regex(
            arr, pattern=r"[\p{L}\p{N}]+").to_numpy().astype(np.int64)
        return pa.table({
            id_col: b[id_col].cast(pa.int64()),
            "nt_p": pa.array(nt),
            "dup_p": pa.array(np.zeros(b.num_rows, np.int64)),
        })

    counts = ds.select_columns([id_col, col]).map_batches(
        tok_counts, batch_format="pyarrow")
    both = counts.union(spans.map_batches(span_lengths,
                                          batch_format="pyarrow"))
    agg = both.groupby(id_col).sum(["nt_p", "dup_p"])

    def finish(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "sum(nt_p)" not in b.column_names:
            return pa.table({id_col: pa.array([], type=pa.int64()),
                             "n_tokens": pa.array([], type=pa.int64()),
                             "dup_tokens": pa.array([], type=pa.int64())})
        return pa.table({
            id_col: b[id_col],
            "n_tokens": b["sum(nt_p)"],
            "dup_tokens": b["sum(dup_p)"],
        })

    return agg.map_batches(finish, batch_format="pyarrow")
