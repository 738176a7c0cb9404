"""DSIR importance weighting (rayfts/ops/dsir.py): target-like docs
score higher, empty docs are neutral, bucket-count fit is exact, and
selection is deterministic."""

import numpy as np
import pandas as pd
import pytest


def _ds(rows):
    import ray

    return ray.data.from_pandas(pd.DataFrame(rows))


TARGET_TEXTS = ["theorem proof lemma algebra"] * 5
NOISE_TEXTS = ["buy cheap pills now online"] * 5


def _corpus():
    texts = TARGET_TEXTS + NOISE_TEXTS + ["theorem proof of the lemma",
                                          "cheap pills", "", None]
    return _ds({"doc_id": list(range(len(texts))), "text": texts})


def test_target_like_scores_higher(ray_session):
    from rayfts.ops.dsir import dsir_log_weights

    raw = _corpus()
    target = _ds({"doc_id": [0], "text": ["theorem proof lemma algebra"]})
    w = (dsir_log_weights(raw, target, num_buckets=512).to_pandas()
         .set_index("doc_id"))
    # math-flavored docs outrank spam docs (same-length comparison:
    # logw is a per-doc likelihood-ratio SUM, so it scales with length)
    assert w.loc[10, "logw"] > w.loc[5, "logw"]
    assert w.loc[0, "logw"] > w.loc[5, "logw"]
    # per-gram rate ranks math over spam regardless of length
    assert (w.loc[10, "logw"] / w.loc[10, "n_grams"]
            > w.loc[11, "logw"] / w.loc[11, "n_grams"])
    # zero-gram docs are exactly neutral
    assert w.loc[12, "logw"] == 0.0 and w.loc[12, "n_grams"] == 0
    assert w.loc[13, "logw"] == 0.0


def test_fit_bucket_counts_exact(ray_session):
    from rayfts.ops.dsir import _gram_buckets, fit_bucket_counts

    import pyarrow as pa

    texts = ["alpha beta gamma", "beta gamma", "alpha", ""]
    ds = _ds({"doc_id": [0, 1, 2, 3], "text": texts})
    got = fit_bucket_counts(ds, num_buckets=64)
    b, _d, _n = _gram_buckets(
        pa.table({"text": pa.array(texts)}), "text", 64)
    want = np.bincount(b, minlength=64)
    assert (got == want).all()
    # 6 unigrams + 3 within-doc bigrams
    assert got.sum() == 9


def test_select_deterministic(ray_session):
    from rayfts.ops.dsir import dsir_select

    raw = _corpus()
    target = _ds({"doc_id": [0], "text": ["theorem proof lemma algebra"]})
    a = dsir_select(raw, target, n_select=4,
                    num_buckets=512).to_pandas()["doc_id"].tolist()
    b = dsir_select(raw, target, n_select=4,
                    num_buckets=512).to_pandas()["doc_id"].tolist()
    assert a == b
    # raw logw is a sum over grams, so the least-negative docs are the
    # empty/short ones, then the math near-copy: deterministic order
    # logw desc, ties by doc_id asc
    assert a == [12, 13, 11, 10]
