"""Global term statistics via an explicit term-partitioned shuffle with
hot-term salting — the north star's "groupby-term shuffle" expressed as
its own pipeline (the index build itself partitions by *document*, which
is skew-free; this pipeline is the term-partitioned view used for
corpus analytics: df/cf tables, stop-word detection, vocabulary export).

Skew handling (SURVEY.md §4): tokenize emits PRE-AGGREGATED partials per
batch (term -> partial df/cf), already collapsing each stop word to ONE
row per batch before the shuffle. On top of that, terms are salted into
``term x salt`` sub-keys so that even a term appearing in every batch
spreads over ``salt_buckets`` reducers; a second, tiny groupby folds the
salted partials. Every row crossing the wide edge is a (term, salt,
partial_df, partial_cf) aggregate, never a raw posting.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from rayfts.analysis.analyzer import Analyzer


class TokenizePartials:
    """Actor-pool stage: analyzer built once per actor; emits per-batch
    partial term stats."""

    def __init__(self, col: str = "text", analyzer: str = "en_stem", salt_buckets: int = 8):
        self.col = col
        self.analyzer = Analyzer(analyzer)
        self.salt_buckets = salt_buckets
        self._salt = 0

    def __call__(self, batch: pa.Table) -> pa.Table:
        spec = self.analyzer.spec
        self._salt = (self._salt + 1) % self.salt_buckets
        if not spec.raw and spec.name != "whitespace":
            # vectorized: whole-column analysis, then bincounts
            codes, doc_idx, _pos, uniques, _counts = (
                self.analyzer.analyze_text_column(batch[self.col])
            )
            if codes.size == 0:
                terms, cf, df = [], np.empty(0, np.int64), np.empty(0, np.int64)
            else:
                nu = len(uniques)
                cf = np.bincount(codes, minlength=nu).astype(np.int64)
                fused = codes.astype(np.int64) * batch.num_rows + doc_idx
                pair_codes = np.unique(fused) // batch.num_rows
                df = np.bincount(pair_codes, minlength=nu).astype(np.int64)
                terms = list(uniques)
        else:
            df_acc: dict[str, int] = {}
            cf_acc: dict[str, int] = {}
            for text in batch[self.col].to_pylist():
                toks = self.analyzer.tokens(text)
                for t in toks:
                    cf_acc[t] = cf_acc.get(t, 0) + 1
                for t in set(toks):
                    df_acc[t] = df_acc.get(t, 0) + 1
            terms = sorted(cf_acc)
            cf = np.array([cf_acc[t] for t in terms], dtype=np.int64)
            df = np.array([df_acc[t] for t in terms], dtype=np.int64)
        return pa.table({
            "term": pa.array(terms, type=pa.string()),
            "salt": pa.array([self._salt] * len(terms), type=pa.int32()),
            "partial_df": pa.array(df, type=pa.int64()),
            "partial_cf": pa.array(cf, type=pa.int64()),
        })


def term_stats_ds(
    ds,
    col: str = "text",
    analyzer: str = "en_stem",
    salt_buckets: int = 8,
    concurrency: int = 4,
):
    """Lazy Dataset of (term, df, cf) over the corpus. Two-level reduce:
    salted partials -> per-(term,salt) sums -> per-term sums. Stays
    distributed — consume with sort/limit/write, never a driver collect."""
    from ray.data.aggregate import Sum

    partials = ds.map_batches(
        TokenizePartials,
        fn_constructor_kwargs={"col": col, "analyzer": analyzer, "salt_buckets": salt_buckets},
        batch_format="pyarrow",
        concurrency=concurrency,
    )
    salted = partials.groupby(["term", "salt"]).aggregate(
        Sum("partial_df", alias_name="df_s"), Sum("partial_cf", alias_name="cf_s")
    )
    return salted.groupby("term").aggregate(
        Sum("df_s", alias_name="df"), Sum("cf_s", alias_name="cf")
    )


def term_stats(ds, **kw) -> "pd.DataFrame":
    """Driver-side (term, df, cf) DataFrame sorted by (cf desc, term) —
    small-result convenience over :func:`term_stats_ds`."""
    out = term_stats_ds(ds, **kw).to_pandas()
    return out.sort_values(["cf", "term"], ascending=[False, True]).reset_index(drop=True)


def top_terms(ds, n: int = 50, **kw) -> pa.Table:
    """Top-n by collection frequency; the sort+limit runs in Ray, so only
    n rows ever reach the driver."""
    final = term_stats_ds(ds, **kw).sort(["cf", "term"], descending=[True, False]).limit(n)
    t = pa.Table.from_pylist(final.take_all())
    return pa.table({
        "term": t["term"].cast(pa.string()),
        "df": t["df"].cast(pa.int64()),
        "cf": t["cf"].cast(pa.int64()),
    })
