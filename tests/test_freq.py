"""Exact heavy hitters (rayfts/ops/freq.py): zero-false-negative
guarantee of the Misra-Gries candidate pass under aggressive summary
truncation, exact verified counts, and threshold edge semantics."""

import collections
import re

import numpy as np
import pandas as pd
import pytest


def _exact(docs, num, den):
    cnt = collections.Counter()
    for t in docs:
        cnt.update(x.lower() for x in re.findall(r"[^\W_]+", t or "", re.UNICODE))
    n = sum(cnt.values())
    hits = [(t, c) for t, c in cnt.items() if c * den >= n * num]
    return sorted(hits, key=lambda tc: (-tc[1], tc[0]))


def _run(docs, num, den, **kw):
    import ray

    from rayfts.ops.freq import heavy_hitters

    ds = ray.data.from_pandas(pd.DataFrame({"text": docs}))
    t = heavy_hitters(ds, phi_num=num, phi_den=den, **kw).to_pandas()
    return list(map(tuple, t.itertuples(index=False, name=None)))


def test_zipf_corpus_exact_at_min_legal_k(ray_session):
    rng = np.random.default_rng(31)
    vocab = [f"tok{i}" for i in range(500)]
    p = 1 / np.arange(1, 501) ** 1.3
    p /= p.sum()
    docs = [" ".join(rng.choice(vocab, size=60, p=p)) for _ in range(300)]
    exp = _exact(docs, 1, 100)
    assert len(exp) > 3
    # k just above the legal floor forces maximal per-batch truncation;
    # the two-pass scheme must still be exact
    assert _run(docs, 1, 100, k=101) == exp
    assert _run(docs, 1, 100) == exp


def test_threshold_edge_is_integer_exact(ray_session):
    # 'a' hits exactly phi*n: 5 of 50 tokens at phi=1/10 -> kept (>=)
    docs = ["a b c d e f g h i j"] * 5
    got = _run(docs, 1, 10)
    exp = _exact(docs, 1, 10)
    assert got == exp
    assert ("a", 5) in got


def test_no_heavy_hitters_returns_empty(ray_session):
    docs = [f"u{i} v{i} w{i}" for i in range(200)]  # all singletons
    assert _run(docs, 1, 100) == []


def test_nulls_and_empty_docs_ignored(ray_session):
    docs = ["common common common rare1", None, "", "common rare2"]
    exp = _exact([d for d in docs if d], 1, 4)
    assert _run(docs, 1, 4) == exp


def test_bad_params_raise(ray_session):
    import ray

    from rayfts.ops.freq import heavy_hitters

    ds = ray.data.from_pandas(pd.DataFrame({"text": ["x"]}))
    with pytest.raises(ValueError):
        heavy_hitters(ds, phi_num=0, phi_den=10)
    with pytest.raises(ValueError):
        heavy_hitters(ds, phi_num=1, phi_den=100, k=50)  # k+1 <= 1/phi


def test_mg_partial_bound_property():
    """Per-batch summary: est <= true, undercount <= n_b/(k+1)."""
    import pyarrow as pa

    from rayfts.ops.freq import mg_partials_batch

    rng = np.random.default_rng(41)
    vocab = [f"t{i}" for i in range(200)]
    docs = [" ".join(rng.choice(vocab, size=40)) for _ in range(50)]
    b = pa.table({"text": pa.array(docs)})
    k = 16
    out = mg_partials_batch(b, k=k).to_pandas()
    true = collections.Counter(
        x.lower() for d in docs for x in re.findall(r"[^\W_]+", d))
    n_b = sum(true.values())
    assert int(out[out.term == ""]["nb"].iloc[0]) == n_b
    ests = out[out.term != ""]
    assert len(ests) <= k
    for r in ests.itertuples():
        assert 0 < r.est <= true[r.term]
        assert true[r.term] - r.est <= n_b // (k + 1) + 1
