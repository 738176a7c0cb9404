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


def _semi_difference(src_ds, drop_ids_ds, drop_col: str, id_col: str,
                     drop_broadcast_limit: int):
    """Remove from ``src_ds`` every row whose ``id_col`` appears in
    ``drop_ids_ds[drop_col]``. Entirely JOIN-FREE (Ray 2.49's hash join
    emits schema-less empty partitions when a ``union`` appears anywhere
    upstream, and drop sets here routinely have union lineage):

    - drop sets up to ``drop_broadcast_limit`` ids broadcast as ONE
      sorted array, probed per batch with ``searchsorted``;
    - larger drop sets broadcast as a CHAIN of sorted chunks, each its
      own ``ray.put`` + anti-filter ``map_batches``; Ray fuses chained
      map operators, so the corpus is still scanned once, and the
      driver only ever holds one chunk transiently (the object store
      owns the rest, spilling if needed)."""
    chunk_cap = max(int(drop_broadcast_limit), 1 << 20)

    def anti_fn(ref):
        def anti(batch: pa.Table) -> pa.Table:
            ids = ray.get(ref)
            vals = batch[id_col].to_numpy(zero_copy_only=False)
            pos = np.searchsorted(ids, vals)
            pos[pos >= ids.size] = 0
            return batch.filter(pa.array(ids[pos] != vals))

        return anti

    out = src_ds
    chunks: list[np.ndarray] = []
    total = 0
    for b in drop_ids_ds.select_columns([drop_col]).iter_batches(batch_format="pyarrow"):
        arr = b[drop_col].to_numpy(zero_copy_only=False)
        chunks.append(arr)
        total += arr.size
        if total > chunk_cap:
            ids = np.unique(np.concatenate(chunks))
            out = out.map_batches(anti_fn(ray.put(ids)),
                                  batch_format="pyarrow")
            chunks, total = [], 0
    ids = np.unique(np.concatenate(chunks or [np.empty(0, np.int64)]))
    if ids.size:
        out = out.map_batches(anti_fn(ray.put(ids)), batch_format="pyarrow")
    return out


def _drop_larger_pair_ids(kept_ds, pairs_ds, id_col: str,
                          drop_broadcast_limit: int):
    """Remove every row whose id appears as ``id_b`` (the larger id) of a
    verified near-dup pair (see :func:`_semi_difference` for the plan)."""
    return _semi_difference(kept_ds, pairs_ds, "id_b", id_col,
                            drop_broadcast_limit)


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
    max_dup_permille: int | None = None,
    dup_min_len: int = 20,
):
    """Full corpus clean: gate -> [substring-dup gate] -> exact dedup ->
    near-dup drop.

    Returns a Dataset of kept rows ``(id_col, lang_pred, n_tokens)``.
    The text column is carried through the dedup stages (minhash needs
    it) and projected away at the end.

    ``max_dup_permille`` (integer per-mille, kept None by default so the
    stage is opt-in) adds the ExactSubstr gate between the stateless
    quality gate and exact dedup: docs whose duplicated-token count
    satisfies ``dup_tokens * 1000 > n_tokens * max_dup_permille`` are
    dropped (integer cross-multiplication, same oracle-exact idiom as
    the other thresholds). Runs on the already-gated survivors, and its
    duplication statistics are computed WITHIN that gated set — the
    semantics a pipeline composing the two stages actually wants."""
    gated = ds.map_batches(
        lambda b: quality_gate_batch(
            b, col=col, id_col=id_col, langs=langs,
            min_tokens=min_tokens, max_tokens=max_tokens,
            alpha_pct=alpha_pct, stop_pct=stop_pct,
        ),
        batch_format="pyarrow",
    )
    if max_dup_permille is not None:
        from rayfts.ops.substr import dup_span_stats

        gated = gated.materialize()  # feeds the dup stats AND the drop
        stats = dup_span_stats(gated, col=col, id_col=id_col,
                               min_len=dup_min_len)

        def dup_drop_ids(b):
            import pyarrow as _pa

            if b.num_rows == 0 or "dup_tokens" not in b.column_names:
                # empty map_groups blocks upstream can arrive schema-less
                return _pa.table({id_col: _pa.array([], type=_pa.int64())})
            dt = b["dup_tokens"].to_numpy(zero_copy_only=False)
            nt = b["n_tokens"].to_numpy(zero_copy_only=False)
            drop = dt * 1000 > nt * max_dup_permille
            return _pa.table({id_col: b[id_col].filter(_pa.array(drop))})

        drop_ids = stats.map_batches(dup_drop_ids, batch_format="pyarrow")
        gated = _semi_difference(gated, drop_ids, id_col, id_col,
                                 drop_broadcast_limit)
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
