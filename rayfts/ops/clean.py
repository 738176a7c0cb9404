"""Composed corpus-cleaning pipeline — the flagship end-to-end
training-data flow over a documents table:

    quality/langid gate  ->  exact dedup  ->  minhash-LSH near-dup drop

Everything is Dataset-in / Dataset-out and reuses the individually
oracle-verified operators (``rayfts.ops.textstats``,
``rayfts.ops.dedup``); this module only contributes the composition,
the integer-exact gate predicate, and the pair-minimal keep rule —
so the whole pipeline stays reproducible bit-for-bit in one SQL query.

Scale shape (100 TB):

- the gate is a stateless vectorized ``map_batches`` filter that runs
  BEFORE any wide edge, so low-quality rows never cross a shuffle;
- exact dedup is the per-batch-combiner + native ``groupby.min``
  aggregate from :func:`rayfts.ops.dedup.exact_dedup` (uniform sha
  keys, broadcast-or-join row recovery);
- near-dup removal drops the LARGER id of every verified pair
  ("pair-minimal keep") — a deterministic, one-pass rule that needs no
  iterative clustering / union-find, and is exactly expressible in SQL
  (``doc_id NOT IN (SELECT id_b FROM pairs)``). The drop set is tiny
  relative to the corpus (it is bounded by the near-dup pair count),
  so the default plan broadcasts the sorted id array once via
  ``ray.put``; past ``drop_broadcast_limit`` ids it falls over to a
  distributed left-outer anti-join so the drop set never touches the
  driver.

All gate thresholds are integers compared with cross-multiplication
(``100 * n_alpha >= alpha_pct * n_chars``) — no float ratios, so the
DuckDB oracle reproduces the predicate exactly.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from rayfts.ops.dedup import exact_dedup, minhash_dedup_pairs
from rayfts.ops.textstats import langid_batch, quality_stats_batch


def quality_gate_batch(
    batch: pa.Table,
    *,
    col: str = "text",
    id_col: str = "doc_id",
    langs: tuple[str, ...] = ("en",),
    min_tokens: int = 20,
    max_tokens: int | None = None,
    alpha_pct: int = 50,
    stop_pct: int = 5,
) -> pa.Table:
    """Vectorized per-batch quality gate. Keeps rows where

    - ``lang_pred`` (stopword-overlap language ID) is in ``langs``;
    - ``min_tokens <= n_tokens``  (and ``<= max_tokens`` if set);
    - ``100 * n_alpha_chars >= alpha_pct * n_chars_total``;
    - ``100 * n_stopwords_en >= stop_pct * n_tokens``.

    Returns only ``(id_col, col, lang_pred, n_tokens)`` for survivors —
    the projection happens here, before any shuffle downstream.
    """
    batch = quality_stats_batch(batch, col)
    batch = langid_batch(batch, col)
    n_tok = batch["n_tokens"].to_numpy()
    n_alpha = batch["n_alpha_chars"].to_numpy()
    n_char = batch["n_chars_total"].to_numpy()
    n_stop = batch["n_stopwords_en"].to_numpy()
    lang = batch["lang_pred"].to_numpy(zero_copy_only=False)
    mask = (
        np.isin(lang, np.asarray(langs, dtype=object))
        & (n_tok >= min_tokens)
        & (100 * n_alpha >= alpha_pct * n_char)
        & (100 * n_stop >= stop_pct * n_tok)
    )
    if max_tokens is not None:
        mask &= n_tok <= max_tokens
    return batch.filter(pa.array(mask)).select([id_col, col, "lang_pred", "n_tokens"])


def _drop_larger_pair_ids(kept_ds, pairs_ds, id_col: str,
                          drop_broadcast_limit: int):
    """Remove every row whose id appears as ``id_b`` (the larger id) of a
    verified near-dup pair. Broadcast semi-difference by default; falls
    over to a distributed left-outer anti-join past the id budget."""
    from rayfts.ops.dedup import _JOIN_AGG_ARGS, _join_partitions

    chunks: list[np.ndarray] = []
    total = 0
    for b in pairs_ds.select_columns(["id_b"]).iter_batches(batch_format="pyarrow"):
        arr = b["id_b"].to_numpy(zero_copy_only=False)
        chunks.append(arr)
        total += arr.size
        if total > drop_broadcast_limit:
            # distributed plan: dedupe the drop ids with a tiny aggregate,
            # attach a marker, left-outer join, keep the unmatched rows
            drop = (
                pairs_ds.select_columns(["id_b"])
                .groupby("id_b").count()
                .map_batches(
                    lambda t: pa.table({
                        id_col: t["id_b"],
                        "__drop": pa.array(np.ones(len(t), np.int8)),
                    }),
                    batch_format="pyarrow",
                )
            )
            joined = kept_ds.join(
                drop, "left_outer", _join_partitions(None), on=(id_col,),
                aggregator_ray_remote_args=_JOIN_AGG_ARGS,
            )

            def keep_unmatched(t: pa.Table) -> pa.Table:
                import pyarrow.compute as pc

                return t.filter(pc.is_null(t["__drop"])).drop_columns(["__drop"])

            return joined.map_batches(keep_unmatched, batch_format="pyarrow")
    # np.unique returns a sorted array — searchsorted-ready as broadcast
    drop_ids = np.unique(np.concatenate(chunks or [np.empty(0, np.int64)]))
    if drop_ids.size == 0:
        return kept_ds
    ref = ray.put(drop_ids)

    def anti(batch: pa.Table) -> pa.Table:
        ids = ray.get(ref)
        vals = batch[id_col].to_numpy(zero_copy_only=False)
        pos = np.searchsorted(ids, vals)
        pos[pos >= ids.size] = 0
        return batch.filter(pa.array(ids[pos] != vals))

    return kept_ds.map_batches(anti, batch_format="pyarrow")


def clean_corpus(
    ds,
    *,
    col: str = "text",
    id_col: str = "doc_id",
    langs: tuple[str, ...] = ("en",),
    min_tokens: int = 20,
    max_tokens: int | None = None,
    alpha_pct: int = 50,
    stop_pct: int = 5,
    jaccard_threshold: float = 0.5,
    num_perm: int = 64,
    bands: int = 16,
    k: int = 3,
    drop_broadcast_limit: int = 5_000_000,
):
    """Full corpus clean: gate -> exact dedup -> near-dup drop.

    Returns a Dataset of kept rows ``(id_col, lang_pred, n_tokens)``.
    The text column is carried through the dedup stages (minhash needs
    it) and projected away at the end.
    """
    gated = ds.map_batches(
        lambda b: quality_gate_batch(
            b, col=col, id_col=id_col, langs=langs,
            min_tokens=min_tokens, max_tokens=max_tokens,
            alpha_pct=alpha_pct, stop_pct=stop_pct,
        ),
        batch_format="pyarrow",
    )
    # exact dedup keeps the smallest-id full row per distinct text;
    # materialize: it feeds BOTH the minhash pass and the final anti-join,
    # and must not recompute the gate + sha aggregate twice
    kept = exact_dedup(gated, col, id_col).materialize()
    pairs = minhash_dedup_pairs(
        kept, col=col, id_col=id_col, num_perm=num_perm, bands=bands,
        k=k, threshold=jaccard_threshold,
    )
    out = _drop_larger_pair_ids(kept, pairs, id_col, drop_broadcast_limit)
    return out.select_columns([id_col, "lang_pred", "n_tokens"])
