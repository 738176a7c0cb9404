"""Exact duplicated-substring span detection over a document corpus —
the "dedup repeated text, not just repeated documents" operator from the
training-data-cleaning literature (Lee et al. 2021, "Deduplicating
Training Data Makes Language Models Better", arXiv:2107.06499 — their
suffix-array ExactSubstr; here re-expressed distributed-first as an
L-token rolling-hash window exchange, the standard scalable equivalent).

Semantics (token coordinates; tokenizer = the corpus-wide RE2 split on
``[^\\p{L}\\p{N}]+`` + lowercase that every dedup/textstats op in this
package shares): an L-token window is *duplicated* when the same L-gram
occurs in >= 2 distinct documents (``scope="cross_doc"``) or >= 2 times
anywhere including within one doc (``scope="any"``). Per document, the
duplicated windows are merged into maximal half-open spans
``[span_start, span_end)`` (overlapping or touching windows fuse).
Documents shorter than L tokens produce no windows.

Distributed plan (two uniform-key exchanges, both pair-free — unlike the
candidate-pair dedups there is NO quadratic hazard anywhere: a boilerplate
L-gram repeated 10^6 times emits 10^6 *rows*, never 10^12 pairs):

1. ``WindowHashes`` actor pool (``map_batches``): Arrow tokenize, bounded
   per-UNIQUE-token md5 cache, ONE global sliding-window polynomial hash
   per batch -> rows ``(h, doc_id, pos, part)`` where ``part = h %
   num_parts`` is uniform by construction.
2. ``groupby(part).map_groups``: per hash partition, one lexsort by
   ``(h, doc_id)``, run detection, keep rows of qualifying runs.
3. Re-key by ``hash(doc_id)`` and merge each doc's kept window starts
   into spans with a vectorized gaps-and-islands pass (equal-length
   windows => islands break exactly where ``pos - prev_pos > L``).

The exchange is corpus-sized (one row per token window) — the price of
exactness, same cost class as ``ngram_jaccard_pairs``; the approximate
alternative at lower cost is minhash/simhash in :mod:`rayfts.ops.dedup`.
Window equality is 64-bit rolling-hash equality: a collision could mark
a span the string oracle would not (probability ~n^2/2^65; negligible at
any tested scale, documented honestly here).

Reference parity note: the reference engine (arso-project/sonar-tantivy)
has no substring dedup — this op is part of the prompt-mandated
LLM-pipeline extension set, not §2 parity.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from rayfts.ops.dedup import (_JOIN_AGG_ARGS, _ShingleStage, _join_partitions,
                              _poly_powers)

__all__ = [
    "WindowHashes",
    "duplicated_spans",
    "dup_span_stats",
]


class WindowHashes(_ShingleStage):
    """Actor-pool stage: (docs) -> one row per full L-token window:
    ``(h, doc_id, pos, part)`` with ``pos`` the 0-based start position in
    the doc's (empty-filtered) token sequence. Whole batch is one
    vectorized pass — tokenization, per-unique-token md5 (bounded cache)
    and the sliding-window polynomial hash are shared with the shingle
    stages via :class:`_ShingleStage`."""

    def __init__(self, col: str = "text", id_col: str = "doc_id",
                 min_len: int = 20, num_parts: int = 64,
                 cache_cap: int | None = None):
        super().__init__(k=min_len, cache_cap=cache_cap)
        self.col = col
        self.id_col = id_col
        self.num_parts = num_parts
        self._powers = _poly_powers(min_len)

    def __call__(self, batch: pa.Table) -> pa.Table:
        L = self.k
        tok_h, doc_idx, n = self._hashed_token_stream(batch[self.col])
        if tok_h.size >= L:
            win = np.lib.stride_tricks.sliding_window_view(tok_h, L)
            with np.errstate(over="ignore"):
                h_all = (win * self._powers).sum(axis=1, dtype=np.uint64)
            w_docs = doc_idx[: doc_idx.size - L + 1]
            valid = w_docs == doc_idx[L - 1:]  # window fully inside one doc
            h = h_all[valid]
            d = w_docs[valid]
            g_idx = np.flatnonzero(valid)
            tok_counts = np.bincount(doc_idx, minlength=n)
            doc_start = np.concatenate(([0], np.cumsum(tok_counts)[:-1]))
            pos = g_idx - doc_start[d]
        else:
            h = np.empty(0, np.uint64)
            d = np.empty(0, np.int64)
            pos = np.empty(0, np.int64)
        ids = batch[self.id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            # shift keeps int64-representable while preserving equality
            "h": pa.array((h >> np.uint64(1)).astype(np.int64)),
            self.id_col: pa.array(ids[d], type=pa.int64()),
            "pos": pa.array(pos.astype(np.int64)),
            "part": pa.array((h % np.uint64(self.num_parts)).astype(np.int32)),
        })


def _keep_duplicated(g: pa.Table, id_col: str, cross_doc: bool) -> pa.Table:
    """One hash partition of window rows -> the rows whose hash run
    qualifies as duplicated (>=2 distinct docs, or >=2 occurrences when
    ``cross_doc`` is False). One lexsort; no per-run Python."""
    if g.num_rows == 0:
        return pa.table({id_col: pa.array([], type=pa.int64()),
                         "pos": pa.array([], type=pa.int64())})
    h = g["h"].to_numpy(zero_copy_only=False)
    d = g[id_col].to_numpy(zero_copy_only=False)
    p = g["pos"].to_numpy(zero_copy_only=False)
    order = np.lexsort((p, d, h))
    h, d, p = h[order], d[order], p[order]
    new_run = np.concatenate(([True], h[1:] != h[:-1]))
    run_id = np.cumsum(new_run) - 1
    n_runs = run_id[-1] + 1
    if cross_doc:
        # distinct docs per run: count (run, doc) boundaries
        new_doc = new_run | np.concatenate(([True], d[1:] != d[:-1]))
        qual_counts = np.bincount(run_id[new_doc], minlength=n_runs)
    else:
        qual_counts = np.bincount(run_id, minlength=n_runs)
    keep = qual_counts[run_id] >= 2
    return pa.table({
        id_col: pa.array(d[keep], type=pa.int64()),
        "pos": pa.array(p[keep], type=pa.int64()),
    })


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
    concurrency: int | tuple | None = None,
):
    """Lazy Dataset of ``(id_col, span_start, span_end)`` — maximal
    duplicated-substring token spans per document (see module docstring
    for semantics and the distributed plan)."""
    import ray

    if scope not in ("cross_doc", "any"):
        raise ValueError(f"scope must be 'cross_doc' or 'any', got {scope!r}")
    if concurrency is None:
        try:
            cpus = int(ray.cluster_resources().get("CPU", 8))
        except Exception:
            cpus = 8
        concurrency = (1, cpus)
    wh = ds.map_batches(
        WindowHashes,
        fn_constructor_kwargs={"col": col, "id_col": id_col,
                               "min_len": min_len, "num_parts": num_parts},
        batch_format="pyarrow",
        batch_size=4096,
        concurrency=concurrency,
    )
    dup = wh.groupby("part").map_groups(
        lambda g: _keep_duplicated(g, id_col, scope == "cross_doc"),
        batch_format="pyarrow",
    )

    def tag_doc(b: pa.Table) -> pa.Table:
        hh = pd.util.hash_array(b[id_col].to_numpy(zero_copy_only=False))
        return b.append_column(
            "dpart", pa.array((hh % np.uint64(num_parts)).astype(np.int32)))

    return (
        dup.map_batches(tag_doc, batch_format="pyarrow")
        .groupby("dpart")
        .map_groups(lambda g: _merge_spans(g, id_col, min_len),
                    batch_format="pyarrow")
    )


def dup_span_stats(
    ds,
    col: str = "text",
    id_col: str = "doc_id",
    min_len: int = 20,
    scope: str = "cross_doc",
    num_parts: int = 64,
    num_partitions: int | None = None,
    concurrency: int | tuple | None = None,
):
    """Per-document duplication stats: ``(id_col, n_tokens, dup_tokens)``
    for EVERY document (0 for docs without duplicated spans). Integer
    columns only, so the result is exactly SQL-oracle comparable;
    ``dup_frac = dup_tokens / n_tokens`` is left to the consumer.

    Plan: the span pipeline above, a tiny per-doc span-length aggregate,
    then one doc-partitioned LEFT join against the (doc_id, n_tokens)
    scan — both sides uniform in ``doc_id``. Used as a corpus-cleaning
    gate (drop docs whose duplicated fraction exceeds a budget)."""
    spans = duplicated_spans(ds, col, id_col, min_len=min_len, scope=scope,
                             num_parts=num_parts, concurrency=concurrency)

    def span_lengths(b: pa.Table) -> pa.Table:
        lens = (b["span_end"].to_numpy(zero_copy_only=False)
                - b["span_start"].to_numpy(zero_copy_only=False))
        return pa.table({
            id_col: b[id_col],
            "dup_tokens_p": pa.array(lens, type=pa.int64()),
        })

    per_doc = (
        spans.map_batches(span_lengths, batch_format="pyarrow")
        .groupby(id_col).sum("dup_tokens_p")
    )

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
            "n_tokens": pa.array(nt),
        })

    counts = ds.select_columns([id_col, col]).map_batches(
        tok_counts, batch_format="pyarrow")
    joined = counts.join(
        per_doc, "left_outer", _join_partitions(num_partitions),
        on=(id_col,), aggregator_ray_remote_args=_JOIN_AGG_ARGS)

    def finish(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        dup = pc.coalesce(b["sum(dup_tokens_p)"], pa.scalar(0, pa.int64()))
        return pa.table({
            id_col: b[id_col],
            "n_tokens": b["n_tokens"],
            "dup_tokens": dup,
        })

    return joined.map_batches(finish, batch_format="pyarrow")
