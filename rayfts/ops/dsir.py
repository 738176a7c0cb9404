"""DSIR-style importance weighting for training-data selection.

Data Selection with Importance Resampling (Xie et al. 2023, public)
scores raw-corpus documents by how target-like they are under hashed
n-gram bag-of-words language models: features are unigrams and bigrams
hashed into ``num_buckets`` buckets; the per-document log importance
weight is

    logw(d) = sum_{g in d} [ ln(t[b(g)] + 1) - ln(r[b(g)] + 1) ]
              + |d| * ( ln(R + B) - ln(T + B) )

where t/r are bucket counts over the target/raw corpora, T/R their
totals and B the bucket count — i.e. ``sum_g ln p_target(b) -
ln p_raw(b)`` with add-one smoothing. Selection takes the top documents
by weight (deterministic variant; the paper's Gumbel perturbation is a
seeded option, off by default so the SQL oracle can reproduce ranks).

Hash conventions (identical in the SQL oracle, shared with
:mod:`rayfts.ops.textstats`): tokens are lowercased ``[\\p{L}\\p{N}]+``
runs; a token hash is the first 8 bytes of its md5; a bigram hash is
``(h1 * 1099511628211 + h2) mod 2**64`` (the k=2 rolling fingerprint);
bucket = hash mod ``num_buckets``. Weights are rounded half-even to
``round_to`` decimals, which absorbs summation-order float drift.

Scale shape: the two fit passes stream per-batch bucket-count partials
(dense ``num_buckets`` vectors, bounded by construction) into an O(B)
driver accumulator — the same summary-sized-reduction pattern as
:mod:`rayfts.ops.quantile` histograms; no shuffle. The per-bucket
log-delta table (B float64s) broadcasts once via ``ray.put`` and the
scoring pass is a stateless vectorized ``map_batches``. B is a
parameter (paper default 10k buckets ~ 80 KB broadcast); nothing scales
with corpus size except the streamed partials.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from rayfts.ops.textstats import _FP_BASE, _flat_tokens, _token_hashes


def _gram_buckets(batch: pa.Table, col: str, num_buckets: int):
    """(bucket index per gram, doc index per gram, n_rows) — unigrams
    then within-doc bigrams, md5 token hashes computed once per UNIQUE
    token."""
    flat, doc_idx, _counts, n = _flat_tokens(batch, col)
    nonempty = pc.utf8_length(flat).to_numpy().astype(np.int64) > 0
    denc = flat.dictionary_encode()
    ind = denc.indices.to_numpy().astype(np.int64)[nonempty]
    docs = doc_idx[nonempty]
    uniq = denc.dictionary.to_pylist()
    uh = _token_hashes(uniq)
    th = uh[ind] if ind.size else np.empty(0, np.uint64)
    hashes = [th]
    gdocs = [docs]
    if th.size >= 2:
        same = docs[1:] == docs[:-1]
        with np.errstate(over="ignore"):
            bg = th[:-1] * _FP_BASE + th[1:]
        hashes.append(bg[same])
        gdocs.append(docs[:-1][same])
    allh = np.concatenate(hashes)
    alld = np.concatenate(gdocs)
    return (allh % np.uint64(num_buckets)).astype(np.int64), alld, n


def fit_bucket_counts(ds, col: str = "text",
                      num_buckets: int = 10_000) -> np.ndarray:
    """Dense int64 bucket-count vector over a corpus. Streams per-batch
    partial vectors off the cluster; driver state is O(num_buckets)."""
    def partial(b: pa.Table) -> pa.Table:
        buckets, _docs, _n = _gram_buckets(b, col, num_buckets)
        cnt = np.bincount(buckets, minlength=num_buckets).astype(np.int64)
        nz = np.flatnonzero(cnt)  # sparse rows: touched buckets only
        return pa.table({"bucket": pa.array(nz, type=pa.int64()),
                         "cnt": pa.array(cnt[nz], type=pa.int64())})

    total = np.zeros(num_buckets, dtype=np.int64)
    part_ds = ds.select_columns([col]).map_batches(
        partial, batch_format="pyarrow", batch_size=4096)
    for b in part_ds.iter_batches(batch_format="pyarrow",
                                  batch_size=1 << 18):
        np.add.at(total, b["bucket"].to_numpy(zero_copy_only=False),
                  b["cnt"].to_numpy(zero_copy_only=False))
    return total


def dsir_log_weights(
    raw_ds,
    target_ds,
    col: str = "text",
    id_col: str = "doc_id",
    num_buckets: int = 10_000,
    round_to: int = 6,
):
    """Lazy Dataset of ``(id_col, n_grams, logw)`` over the raw corpus.
    ``logw`` is the smoothed hashed-ngram log importance ratio (see
    module doc); ``n_grams`` the doc's unigram+bigram feature count."""
    import ray

    t = fit_bucket_counts(target_ds, col=col, num_buckets=num_buckets)
    r = fit_bucket_counts(raw_ds, col=col, num_buckets=num_buckets)
    B = float(num_buckets)
    const = float(np.log(r.sum() + B) - np.log(t.sum() + B))
    delta = np.log(t + 1.0) - np.log(r + 1.0)
    delta_ref = ray.put(delta)

    def score(b: pa.Table) -> pa.Table:
        d = ray.get(delta_ref)
        buckets, docs, n = _gram_buckets(b, col, num_buckets)
        tot = np.zeros(n, dtype=np.float64)
        np.add.at(tot, docs, d[buckets])
        ng = np.bincount(docs, minlength=n).astype(np.int64)
        logw = np.round(tot + ng * const, round_to)
        return pa.table({
            id_col: b[id_col],
            "n_grams": pa.array(ng, type=pa.int64()),
            "logw": pa.array(logw, type=pa.float64()),
        })

    return raw_ds.select_columns([id_col, col]).map_batches(
        score, batch_format="pyarrow", batch_size=4096)


def dsir_select(
    raw_ds,
    target_ds,
    n_select: int,
    col: str = "text",
    id_col: str = "doc_id",
    num_buckets: int = 10_000,
):
    """Top ``n_select`` raw docs by log importance weight (ties broken
    by id — deterministic, SQL-reproducible). The sort runs in Ray over
    (id, n_grams, logw) rows only, never over document text."""
    w = dsir_log_weights(raw_ds, target_ds, col=col, id_col=id_col,
                         num_buckets=num_buckets)
    return (w.sort(["logw", id_col], descending=[True, False])
            .limit(n_select))
