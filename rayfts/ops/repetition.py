"""Repetition quality signals for training-data filtering.

The Gopher / MassiveText quality pipeline (Rae et al. 2021, "Scaling
Language Models: ... & Gopher", Appendix A — public) filters documents
by repetition: fraction of duplicate LINES, fraction of characters in
duplicate lines, character mass of the most frequent word 2-gram, and
duplicate n-gram fractions. The same family is used by RefinedWeb,
Dolma and FineWeb.

All signals here are EXACT INTEGERS (counts and char sums, not
pre-divided fractions) so the DuckDB oracle can reproduce them
bit-for-bit; callers divide when thresholding
(:func:`repetition_filter`).

Conventions (identical in the SQL oracle):

- a LINE is a ``\\n``-separated segment, stripped of ASCII whitespace
  ``" \\t\\r\\f\\v"`` on both sides; empty-after-strip lines are ignored;
  duplicate = any occurrence beyond the first of an identical line;
- a WORD is a lowercased ``[\\p{L}\\p{N}]+`` run (the corpus-wide token
  convention shared with :mod:`rayfts.ops.textstats`);
- ``top_2gram_char_cover`` = max over distinct word 2-grams of
  ``count * (len(w1) + len(w2))`` — a deterministic max-of-products
  (no most-frequent tie-break needed);
- 5-gram stats count WORD 5-grams; duplicate = occurrences beyond the
  first of an identical 5-tuple.

Scale shape: one stateless vectorized ``map_batches`` — whole-column
Arrow split/trim/length kernels plus hash-based factorize run counting
(O(tokens) per batch for the n-gram signals; the line signals use a
small lexsort over per-doc line counts); zero shuffles, zero per-row
Python.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

_LINE_STRIP = " \t\r\f\v"

_INT_COLS = (
    "n_lines", "n_dup_lines", "n_line_chars", "n_dup_line_chars",
    "n_words", "n_word_chars", "top_2gram_count", "top_2gram_char_cover",
    "n_5grams", "n_dup_5grams",
)


def _per_doc_dup_counts(doc_idx, keys, weights, n):
    """Runs of identical (doc, *keys) rows -> per-doc (total, dup,
    weighted total, weighted dup) where dup = occurrences beyond the
    first of each run and run weight is taken from its first row."""
    if doc_idx.size == 0:
        z = np.zeros(n, dtype=np.int64)
        return z, z.copy(), z.copy(), z.copy()
    order = np.lexsort(tuple(reversed(keys)) + (doc_idx,))
    d = doc_idx[order]
    ks = [k[order] for k in keys]
    new = np.ones(d.size, dtype=bool)
    new[1:] = d[1:] != d[:-1]
    for k in ks:
        new[1:] |= k[1:] != k[:-1]
    starts = np.flatnonzero(new)
    runlen = np.diff(np.append(starts, d.size))
    rdoc = d[starts]
    w = weights[order][starts] if weights is not None else np.ones(
        starts.size, dtype=np.int64)
    total = np.bincount(doc_idx, minlength=n).astype(np.int64)
    dup = np.bincount(rdoc, weights=(runlen - 1), minlength=n).astype(np.int64)
    wtotal = (np.bincount(rdoc, weights=runlen * w, minlength=n)
              .astype(np.int64))
    wdup = (np.bincount(rdoc, weights=(runlen - 1) * w, minlength=n)
            .astype(np.int64))
    return total, dup, wtotal, wdup


def repetition_stats_batch(batch: pa.Table, col: str = "text") -> pa.Table:
    """Append the ten exact repetition-signal columns (see module doc)."""
    arr = batch[col]
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if pa.types.is_null(arr.type):  # all-null block (e.g. from_items)
        arr = arr.cast(pa.string())
    arr = pc.fill_null(arr, "")
    n = len(arr)

    # -- lines ------------------------------------------------------------
    sp = pc.split_pattern(arr, pattern="\n")
    lcounts = pc.list_value_length(sp).to_numpy().astype(np.int64)
    flat = pc.utf8_trim(pc.list_flatten(sp), characters=_LINE_STRIP)
    ldoc = np.repeat(np.arange(n, dtype=np.int64), lcounts)
    llen = pc.utf8_length(flat).to_numpy().astype(np.int64)
    keep = llen > 0
    ldoc_k, llen_k = ldoc[keep], llen[keep]
    lcodes = (flat.filter(pa.array(keep)).dictionary_encode()
              .indices.to_numpy().astype(np.int64)) if keep.any() else \
        np.empty(0, np.int64)
    # weights must be per-run-constant: identical lines share a length
    n_lines, n_dup_lines, n_line_chars, n_dup_line_chars = \
        _per_doc_dup_counts(ldoc_k, [lcodes], llen_k, n)

    # -- words ------------------------------------------------------------
    wsp = pc.split_pattern_regex(arr, pattern=r"[^\p{L}\p{N}]+")
    wcounts = pc.list_value_length(wsp).to_numpy().astype(np.int64)
    wflat = pc.utf8_lower(pc.list_flatten(wsp))
    wdoc = np.repeat(np.arange(n, dtype=np.int64), wcounts)
    wlen_all = pc.utf8_length(wflat).to_numpy().astype(np.int64)
    wkeep = wlen_all > 0
    wdoc = wdoc[wkeep]
    denc = wflat.filter(pa.array(wkeep)).dictionary_encode() if \
        wkeep.any() else pa.array([], type=pa.string()).dictionary_encode()
    codes = denc.indices.to_numpy().astype(np.int64)
    dlens = pc.utf8_length(denc.dictionary).to_numpy().astype(np.int64)
    n_words = np.bincount(wdoc, minlength=n).astype(np.int64)
    n_word_chars = np.bincount(
        wdoc, weights=dlens[codes] if codes.size else None,
        minlength=n).astype(np.int64)

    # -- word n-grams -----------------------------------------------------
    # EXACT n-gram identity via hierarchical factorize-packing: pair
    # codes are re-encoded after every pairing so every product stays
    # < 2^63, and each step is one O(n) hash-based pd.factorize —
    # replacing the multi-key lexsorts, which dominated the whole gate
    # (~64% of batch time on a code corpus). Factorize ids are injective
    # on the observed values (an exact re-encode, not a hash digest), so
    # semantics are identical: no collisions, no sort needed.
    top_cnt = np.zeros(n, dtype=np.int64)
    top_cover = np.zeros(n, dtype=np.int64)
    n_5grams = np.zeros(n, dtype=np.int64)
    n_dup_5grams = np.zeros(n, dtype=np.int64)
    if codes.size >= 2:
        V = np.int64(max(len(denc.dictionary), 1))
        c2 = codes[:-1] * V + codes[1:]
        # pd.factorize = exact hash-based re-encode (no sort; unique ids
        # in first-seen order, which nothing here depends on)
        p2, u2 = pd.factorize(c2)
        V2 = np.int64(u2.size)

        # 2-grams: max count and max count*charlen per doc
        same = wdoc[1:] == wdoc[:-1]
        d2 = wdoc[:-1][same]
        if d2.size:
            f2, uf2 = pd.factorize(d2 * V2 + p2[same])
            cnt2 = np.bincount(f2).astype(np.int64)
            rdoc2 = uf2 // V2
            pair = u2[uf2 % V2]
            charlen = dlens[pair // V] + dlens[pair % V]
            np.maximum.at(top_cnt, rdoc2, cnt2)
            np.maximum.at(top_cover, rdoc2, cnt2 * charlen)

        # 5-grams: duplicate occurrences per doc
        if codes.size >= 5:
            c4 = p2[:-2] * V2 + p2[2:]  # gram (i..i+3) = pair of pairs
            p4, _u4 = pd.factorize(c4)
            c5 = p4[:-1] * V + codes[4:]
            same5 = np.ones(codes.size - 4, dtype=bool)
            for j in range(1, 5):
                same5 &= wdoc[j:j + codes.size - 4] == wdoc[:-4]
            d5 = wdoc[:-4][same5]
            if d5.size:
                p5, _u5 = pd.factorize(c5[same5])
                f5, uf5 = pd.factorize(d5 * np.int64(_u5.size) + p5)
                cnt5 = np.bincount(f5).astype(np.int64)
                n_5grams = np.bincount(d5, minlength=n).astype(np.int64)
                n_dup_5grams = np.bincount(
                    uf5 // _u5.size, weights=cnt5 - 1,
                    minlength=n).astype(np.int64)

    out = batch
    for name, vals in zip(_INT_COLS, (
            n_lines, n_dup_lines, n_line_chars, n_dup_line_chars,
            n_words, n_word_chars, top_cnt, top_cover,
            n_5grams, n_dup_5grams)):
        out = out.append_column(name, pa.array(vals, type=pa.int64()))
    return out


def repetition_stats(ds, col: str = "text", id_col: str = "doc_id"):
    """Corpus -> Dataset(id_col, 10 exact repetition-signal columns)."""
    def fn(b: pa.Table) -> pa.Table:
        return repetition_stats_batch(b, col).select(
            [id_col, *_INT_COLS])

    return ds.select_columns([id_col, col]).map_batches(
        fn, batch_format="pyarrow")


def repetition_filter(
    ds,
    col: str = "text",
    id_col: str = "doc_id",
    max_dup_line_frac: float = 0.30,
    max_dup_line_char_frac: float = 0.20,
    max_top_2gram_char_frac: float = 0.20,
    max_dup_5gram_frac: float = 0.15,
):
    """Drop documents exceeding any Gopher-style repetition threshold
    (defaults are the published Gopher values for these four signals).
    Stateless gate — runs BEFORE any shuffle in a cleaning pipeline."""
    def gate(b: pa.Table) -> pa.Table:
        s = repetition_stats_batch(b, col)
        lines = s["n_lines"].to_numpy().astype(np.float64)
        lchars = s["n_line_chars"].to_numpy().astype(np.float64)
        wchars = s["n_word_chars"].to_numpy().astype(np.float64)
        g5 = s["n_5grams"].to_numpy().astype(np.float64)
        ok = np.ones(b.num_rows, dtype=bool)
        with np.errstate(divide="ignore", invalid="ignore"):
            ok &= ~(s["n_dup_lines"].to_numpy() > max_dup_line_frac * lines)
            ok &= ~(s["n_dup_line_chars"].to_numpy()
                    > max_dup_line_char_frac * lchars)
            ok &= ~(s["top_2gram_char_cover"].to_numpy()
                    > max_top_2gram_char_frac * wchars)
            ok &= ~(s["n_dup_5grams"].to_numpy() > max_dup_5gram_frac * g5)
        return b.filter(pa.array(ok))

    return ds.map_batches(gate, batch_format="pyarrow")
