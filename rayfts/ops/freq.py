"""Exact frequent-items (heavy hitters) via a mergeable Misra-Gries
candidate sweep + one exact verification pass — finds EVERY token whose
collection frequency is >= phi of the total token count, with no
term-partitioned shuffle of raw counts.

Why not just ``term_stats``? That pipeline shuffles one partial row per
(term, batch) — exact and skew-safe, but the exchange is vocabulary-
sized. Heavy hitters only needs the Zipf head, and the classic two-pass
scheme gets it exactly while moving ``O(batches x k)`` summary rows:

1. **Candidate pass** (stateless ``map_batches``): per batch, exact
   vectorized token counts (Arrow RE2 split + dictionary bincount),
   truncated Misra-Gries style — keep the top-``k`` items with the
   (k+1)-th count subtracted. Per-batch undercount <= n_b/(k+1), so the
   summed estimate undercounts any item by at most n/(k+1) and never
   overcounts (Misra & Gries 1982; Manku & Motwani's lossy-counting
   bound family). With ``k+1 > den/num`` every true heavy hitter
   survives the candidate filter — zero false negatives, proven, not
   heuristic. Summaries fold in a tiny uniform-key groupby.
2. **Verify pass** (stateless ``map_batches``): broadcast the candidate
   list (``ray.put`` once, O(k·den/num) items), count candidates
   exactly per batch, sum, and keep ``cnt * den >= n * num`` — exact
   integer threshold arithmetic end to end, which is what makes the
   result SQL-oracle comparable.

Both passes stream; the only exchanges are summary-sized. At 100 TB the
corpus is read twice — the standard price of exact heavy hitters below
a full term shuffle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

__all__ = ["mg_partials_batch", "heavy_hitters"]

_TOKEN_RE = r"[^\p{L}\p{N}]+"


def _batch_token_counts(batch: pa.Table, col: str):
    """(terms: list[str], counts: np.int64[], n_tokens) — exact counts
    of the batch's tokens, fully vectorized."""
    import pyarrow.compute as pc

    arr = batch[col]
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    arr = pc.fill_null(arr, "")
    flat = pc.utf8_lower(pc.list_flatten(
        pc.split_pattern_regex(arr, pattern=_TOKEN_RE)))
    denc = flat.dictionary_encode()
    codes = denc.indices.to_numpy().astype(np.int64)
    uniq = denc.dictionary
    lens = pc.utf8_length(uniq).to_numpy().astype(np.int64)
    cnt = np.bincount(codes, minlength=len(uniq)).astype(np.int64)
    keep = lens > 0  # the split emits empty fields at string edges
    terms = uniq.filter(pa.array(keep)).to_pylist()
    cnt = cnt[keep]
    return terms, cnt, int(cnt.sum())


def mg_partials_batch(batch: pa.Table, col: str = "text", k: int = 1024) -> pa.Table:
    """One batch -> a Misra-Gries summary: top-k terms with the (k+1)-th
    count subtracted (undercount <= n_b/(k+1), never an overcount). The
    sentinel row (term='') carries the batch's total token count — ''
    can never be a token, so it folds through the groupby untouched."""
    terms, cnt, n_b = _batch_token_counts(batch, col)
    if cnt.size > k:
        kth = np.partition(cnt, cnt.size - k - 1)[cnt.size - k - 1]
        est = cnt - kth
        keep = np.flatnonzero(est > 0)
        terms = [terms[i] for i in keep]
        est = est[keep]
    else:
        est = cnt
    return pa.table({
        "term": pa.array([""] + list(terms), type=pa.string()),
        "est": pa.array(np.concatenate(([0], est)), type=pa.int64()),
        "nb": pa.array([n_b] + [0] * len(terms), type=pa.int64()),
    })


def heavy_hitters(
    ds,
    col: str = "text",
    phi_num: int = 1,
    phi_den: int = 200,
    k: int | None = None,
) -> pa.Table:
    """Exact ``(term, cnt)`` of every token with collection frequency
    ``cnt * phi_den >= n * phi_num``, sorted by (cnt desc, term). See the
    module docstring for the two-pass plan and the exactness argument."""
    import ray

    if phi_num <= 0 or phi_den <= 0 or phi_num > phi_den:
        raise ValueError(f"phi must be a fraction in (0, 1], got {phi_num}/{phi_den}")
    if k is None:
        # k+1 > 4/phi: error bound n/(k+1) < phi*n/4, small candidate set
        k = max(64, (4 * phi_den) // phi_num)
    if (k + 1) * phi_num <= phi_den:
        raise ValueError(f"k={k} too small for phi={phi_num}/{phi_den}: "
                         "need k+1 > phi_den/phi_num for zero false negatives")

    partials = ds.map_batches(
        mg_partials_batch,
        fn_kwargs={"col": col, "k": k},
        batch_format="pyarrow",
        batch_size=8192,
    )
    # summary-sized uniform-key groupby; stays a Dataset so the (large)
    # non-candidate tail is filtered distributed, never on the driver —
    # materialized once because both n and the filter read it
    folded = partials.groupby("term").sum(["est", "nb"]).materialize()
    n = int(folded.sum("sum(nb)") or 0)
    if n == 0:
        return pa.table({"term": pa.array([], type=pa.string()),
                         "cnt": pa.array([], type=pa.int64())})
    # exact integer candidate filter: true >= ceil(phi*n) implies
    # est >= true - n//(k+1) - 1, so (est + slack)*den >= n*num keeps
    # every true heavy hitter (zero false negatives)
    slack = n // (k + 1) + 1

    def cand_filter(b: pa.Table) -> pa.Table:
        est = b["sum(est)"].to_numpy(zero_copy_only=False)
        terms = b["term"].to_numpy(zero_copy_only=False)
        m = ((est + slack) * phi_den >= n * phi_num) & (terms != "")
        return pa.table({"term": pa.array(terms[m], type=pa.string())})

    cand_df = folded.map_batches(cand_filter, batch_format="pyarrow").to_pandas()
    if len(cand_df) == 0:
        return pa.table({"term": pa.array([], type=pa.string()),
                         "cnt": pa.array([], type=pa.int64())})
    cands = np.sort(cand_df["term"].to_numpy())
    cand_ref = ray.put(cands)

    def exact_counts(b: pa.Table) -> pa.Table:
        cs = ray.get(cand_ref)
        terms, cnt, _nb = _batch_token_counts(b, col)
        tarr = np.asarray(terms, dtype=object)
        idx = np.searchsorted(cs, tarr)
        idx_c = np.clip(idx, 0, cs.size - 1)
        hit = cs[idx_c] == tarr
        out = np.zeros(cs.size, dtype=np.int64)
        np.add.at(out, idx_c[hit], cnt[hit])
        nz = np.flatnonzero(out)
        return pa.table({
            "ci": pa.array(nz.astype(np.int64)),
            "c": pa.array(out[nz]),
        })

    # candidate-sized reduce in Ray (batches x #HH nonzero rows fold to
    # #candidates rows before the driver sees anything)
    cp = (ds.map_batches(exact_counts, batch_format="pyarrow")
          .groupby("ci").sum("c").to_pandas())
    totals = np.zeros(cands.size, dtype=np.int64)
    totals[cp["ci"].to_numpy()] = cp["sum(c)"].to_numpy()
    keep = totals * phi_den >= n * phi_num
    out = pd.DataFrame({"term": cands[keep], "cnt": totals[keep]})
    out = out.sort_values(["cnt", "term"], ascending=[False, True])
    return pa.table({
        "term": pa.array(out["term"].tolist(), type=pa.string()),
        "cnt": pa.array(out["cnt"].to_numpy(), type=pa.int64()),
    })
