"""Corpus-trained bigram language-model perplexity scoring — the
CCNet-style quality signal ("score each document by how surprising it
is under a language model of the corpus"; Wenzek et al. 2020 use a
5-gram KenLM, this op trains an add-one-smoothed bigram model on the
corpus itself so the pipeline has zero external artifacts).

Model: P(w_i | w_{i-1}) = (c(w_{i-1}, w_i) + 1) / (c(w_{i-1}) + V)
with V = |unigram vocabulary|; per-doc score is the average negative
natural log-probability over the doc's bigrams (docs with < 2 tokens
score NULL). Lower = more typical of the corpus; a cleaning gate drops
the top tail. Integer counts + one final float division keep the SQL
oracle exact to rounding.

Distributed shape (two streaming passes + summary exchanges):

1. **Count pass**: per batch, vectorized unigram and bigram partial
   counts (dictionary-encode once; bigrams are adjacent code pairs
   within a doc, fused into one int64). Partials fold in uniform-hash
   groupbys — one row per DISTINCT (gram, batch), the pre-aggregation
   rule every shuffle in this package follows.
2. **Model broadcast**: the folded tables become two sorted int64
   arrays in the object store (``ray.put`` once). The vocabulary is
   capped at ``max_vocab`` most-frequent unigrams (ties broken by
   token hash) — on a 100 TB corpus the FULL bigram table is too big
   to broadcast, and the cap is the standard LM answer; grams outside
   the cap fall back to add-one smoothing over the capped V, and a
   kept bigram whose CONTEXT fell out of the vocab is dropped too
   (cb <= cu invariant). The cap sorts run only when a cap binds.
   **Driver footprint is sized in bytes, not rows**: the defaults
   (``max_vocab`` 2^20, ``max_bigrams`` 2^23) bound the pulled model
   at ~16 MB + ~200 MB (3 int64 columns/row, ~2x transient during the
   chunked numpy concat), streamed via ``iter_batches`` — no pandas
   frame ever materializes on the driver.
3. **Score pass**: stateless ``map_batches`` — re-tokenize, hash grams,
   two ``searchsorted`` probes, one vectorized log.

The corpus is read twice (count + score), like every two-pass op here.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

__all__ = ["bigram_lm_scores"]


def _doc_token_hashes(batch: pa.Table, col: str):
    """(tok_hash uint64, doc_idx, n_docs) via the corpus tokenizer
    (RE2 split, lower, empties dropped) and pandas' 64-bit string
    hash — vectorized, no per-token Python."""
    import pyarrow.compute as pc

    arr = batch[col]
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    arr = pc.fill_null(arr, "")
    n = len(arr)
    sp = pc.split_pattern_regex(arr, pattern=r"[^\p{L}\p{N}]+")
    counts = pc.list_value_length(sp).to_numpy().astype(np.int64)
    flat = pc.utf8_lower(pc.list_flatten(sp))
    # hash only the UNIQUE tokens (dictionary), then scatter — on a
    # Zipfian stream this is orders of magnitude fewer Python objects
    # than hashing every occurrence
    denc = flat.dictionary_encode()
    uniq = denc.dictionary
    uh = pd.util.hash_array(np.asarray(uniq.to_pylist(), dtype=object))
    ind = denc.indices.to_numpy().astype(np.int64)
    nonempty = pc.utf8_length(uniq).to_numpy().astype(np.int64) > 0
    keep = nonempty[ind]
    th = uh[ind][keep]
    doc_idx = np.repeat(np.arange(n, dtype=np.int64), counts)[keep]
    return th, doc_idx, n


def _gram_partials(th: np.ndarray, doc_idx: np.ndarray):
    """Unique unigram/bigram hash keys + partial counts for one batch.
    Bigram key = fold of the adjacent token hashes (order-sensitive)."""
    if th.size == 0:
        e = np.empty(0, np.uint64)
        z = np.empty(0, np.int64)
        # 5-tuple like the normal path (uni, uc, bi, bc, ctx) — a batch
        # of all-empty texts must not crash the unpack in partials()
        return e, z, np.empty(0, np.uint64), np.empty(0, np.int64), \
            np.empty(0, np.uint64)
    uni, uc = np.unique(th, return_counts=True)
    if th.size >= 2:
        same = doc_idx[1:] == doc_idx[:-1]
        with np.errstate(over="ignore"):
            bg = (th[:-1] * np.uint64(0x9E3779B97F4A7C15)) ^ th[1:]
        prev = th[:-1][same]
        bi, first, bc = np.unique(bg[same], return_index=True,
                                  return_counts=True)
        ctx = prev[first]  # context token hash, constant per bigram key
    else:
        bi, bc = np.empty(0, np.uint64), np.empty(0, np.int64)
        ctx = np.empty(0, np.uint64)
    return uni, uc.astype(np.int64), bi, bc.astype(np.int64), ctx


def bigram_lm_scores(
    ds,
    col: str = "text",
    id_col: str = "doc_id",
    max_vocab: int = 1 << 20,
    max_bigrams: int = 1 << 23,
    round_to: int = 6,
):
    """Lazy Dataset of ``(id_col, n_bigrams, nll)`` — per-doc average
    negative log bigram probability (NULL when < 2 tokens), rounded to
    ``round_to`` decimals so distributed float summation order cannot
    leak into equality checks. See module docstring."""
    import ray

    if max_vocab <= 0:
        raise ValueError(f"max_vocab must be positive, got {max_vocab}")

    def partials(b: pa.Table) -> pa.Table:
        th, di, _ = _doc_token_hashes(b, col)
        uni, uc, bi, bc, ctx = _gram_partials(th, di)
        return pa.table({
            "g": pa.array(np.concatenate([uni, bi]).astype(np.int64)),
            "kind": pa.array(np.concatenate([
                np.zeros(uni.size, np.int8), np.ones(bi.size, np.int8)])),
            "c": pa.array(np.concatenate([uc, bc])),
            # context token hash per bigram key (0 for unigram rows) —
            # lets the cap logic keep the cb <= cu invariant
            "ctx": pa.array(np.concatenate(
                [np.zeros(uni.size, np.int64), ctx.astype(np.int64)])),
        })

    from ray.data.aggregate import Min, Sum

    folded = (ds.select_columns([col])
              .map_batches(partials, batch_format="pyarrow")
              .groupby(["g", "kind"])
              .aggregate(Sum("c"), Min("ctx")).materialize())

    def only_kind(k):
        def f(b: pa.Table) -> pa.Table:
            m = b["kind"].to_numpy(zero_copy_only=False) == k
            return pa.table({"g": b["g"].filter(pa.array(m)),
                             "c": b["sum(c)"].filter(pa.array(m)),
                             "ctx": b["min(ctx)"].filter(pa.array(m))})

        return f

    def pull_cols(d, cols):
        """Stream a (cap-bounded) Dataset's columns into flat int64
        numpy arrays — no driver-side pandas frame; peak driver memory
        is ~2x the final arrays (chunks + concat), i.e. bounded by the
        caps: default max_bigrams = 2^23 rows x 24 B ~ 200 MB."""
        parts = {c: [] for c in cols}
        for b in d.iter_batches(batch_format="pyarrow", batch_size=1 << 20):
            for c in cols:
                parts[c].append(b[c].to_numpy(zero_copy_only=False))
        return tuple(
            np.concatenate(parts[c]).astype(np.int64) if parts[c]
            else np.empty(0, np.int64) for c in cols)

    uni_ds = folded.map_batches(only_kind(0), batch_format="pyarrow")
    # vocabulary cap: top max_vocab unigrams by (count desc, hash) —
    # the sort/limit runs in Ray, the driver sees <= max_vocab rows;
    # the (expensive) distributed sort is SKIPPED when the cap does not
    # bind, which is every realistic sub-corpus
    if uni_ds.count() > max_vocab:
        uni_ds = (uni_ds.sort(["c", "g"], descending=[True, False])
                  .limit(max_vocab))
    uni_keys, uni_counts_raw = pull_cols(uni_ds, ["g", "c"])
    V = uni_keys.size
    if V == 0:
        return ds.select_columns([id_col]).map_batches(
            lambda b: pa.table({
                id_col: b[id_col],
                "n_bigrams": pa.array(np.zeros(b.num_rows, np.int64)),
                "nll": pa.array([None] * b.num_rows, type=pa.float64()),
            }), batch_format="pyarrow")
    uni_order = np.argsort(uni_keys)
    uni_sorted = uni_keys[uni_order]
    uni_counts = uni_counts_raw[uni_order]

    # bigram table capped like the vocab (top by count; ties by key) so
    # the broadcast stays bounded at corpus scale; dropped rare bigrams
    # degrade to the add-one floor, which is exactly their neighborhood.
    # Sort only when the cap binds, and keep ONLY bigrams whose context
    # survived the vocab cap — otherwise a kept bigram could carry more
    # mass than its zeroed context (cb <= cu invariant)
    bi_ds = folded.map_batches(only_kind(1), batch_format="pyarrow")
    if bi_ds.count() > max_bigrams:
        bi_ds = (bi_ds.sort(["c", "g"], descending=[True, False])
                 .limit(max_bigrams))
    bi_keys_raw, bi_cnt_raw, ctx = pull_cols(bi_ds, ["g", "c", "ctx"])
    ix = np.clip(np.searchsorted(uni_sorted, ctx), 0, uni_sorted.size - 1)
    keep = uni_sorted[ix] == ctx
    bi_keys = bi_keys_raw[keep]
    bi_order = np.argsort(bi_keys)
    model_ref = ray.put((uni_sorted, uni_counts,
                         bi_keys[bi_order], bi_cnt_raw[keep][bi_order]))

    def score(b: pa.Table) -> pa.Table:
        us, ucnt, bs, bcnt = ray.get(model_ref)
        th, di, n = _doc_token_hashes(b, col)
        ids = b[id_col].to_numpy(zero_copy_only=False)
        nb = np.zeros(n, dtype=np.int64)
        tot = np.zeros(n, dtype=np.float64)
        if th.size >= 2:
            same = di[1:] == di[:-1]
            with np.errstate(over="ignore"):
                bg = (th[:-1] * np.uint64(0x9E3779B97F4A7C15)) ^ th[1:]
            bg = bg[same].astype(np.int64)
            prev = th[:-1][same].astype(np.int64)
            docs = di[:-1][same]
            # unigram context count (0 if context fell out of the vocab cap)
            ui = np.searchsorted(us, prev)
            ui_c = np.clip(ui, 0, us.size - 1)
            u_hit = us[ui_c] == prev
            cu = np.where(u_hit, ucnt[ui_c], 0)
            if bs.size:
                bi_c = np.clip(np.searchsorted(bs, bg), 0, bs.size - 1)
                cb = np.where(bs[bi_c] == bg, bcnt[bi_c], 0)
            else:
                cb = np.zeros(bg.size, dtype=np.int64)
            nll = -(np.log(cb + 1.0) - np.log(cu + float(V)))
            np.add.at(nb, docs, 1)
            np.add.at(tot, docs, nll)
        avg = np.where(nb > 0, tot / np.maximum(nb, 1), np.nan)
        avg = np.round(avg, round_to)
        return pa.table({
            id_col: pa.array(ids),
            "n_bigrams": pa.array(nb),
            "nll": pa.array(avg, type=pa.float64(), mask=nb == 0),
        })

    return ds.select_columns([id_col, col]).map_batches(
        score, batch_format="pyarrow")
