"""Bigram-LM perplexity scoring (rayfts/ops/lm.py): equality with a
pure-Python reference model, cap semantics, short-doc NULLs."""

import collections
import math
import re

import numpy as np
import pandas as pd
import pytest


def _toks(t):
    return [x.lower() for x in re.findall(r"[^\W_]+", t or "", re.UNICODE)]


def _ref(docs):
    uni = collections.Counter()
    bi = collections.Counter()
    for t in docs.values():
        ts = _toks(t)
        uni.update(ts)
        bi.update(zip(ts, ts[1:]))
    V = len(uni)
    out = {}
    for did, t in docs.items():
        ts = _toks(t)
        pairs = list(zip(ts, ts[1:]))
        if not pairs:
            out[did] = (0, None)
            continue
        s = sum(-(math.log(bi[p] + 1.0) - math.log(uni[p[0]] + V))
                for p in pairs)
        out[did] = (len(pairs), round(s / len(pairs), 6))
    return out


def _run(docs, **kw):
    import ray

    from rayfts.ops.lm import bigram_lm_scores

    ds = ray.data.from_pandas(pd.DataFrame(
        {"doc_id": list(docs), "text": list(docs.values())}))
    out = bigram_lm_scores(ds, **kw).to_pandas().sort_values("doc_id")
    return {r.doc_id: (r.n_bigrams, None if pd.isna(r.nll) else round(r.nll, 6))
            for r in out.itertuples()}


def test_matches_reference_model(ray_session):
    rng = np.random.default_rng(37)
    vocab = [f"w{i}" for i in range(60)]
    p = 1 / np.arange(1, 61) ** 1.2
    p /= p.sum()
    docs = {i: " ".join(rng.choice(vocab, size=rng.integers(0, 40), p=p))
            for i in range(120)}
    assert _run(docs) == _ref(docs)


def test_common_text_scores_lower_than_rare(ray_session):
    base = {i: "the quick brown fox jumps over the lazy dog" for i in range(50)}
    base[1000] = "zyx wvu tsr qpo nml kji hgf"  # alien token sequence
    got = _run(base)
    typical = got[0][1]
    alien = got[1000][1]
    assert alien > typical  # more surprising under the corpus LM


def test_short_and_empty_docs_null(ray_session):
    docs = {1: "single", 2: "", 3: None, 4: "two tokens"}
    got = _run(docs)
    assert got[1] == (0, None)
    assert got[2] == (0, None)
    assert got[3] == (0, None)
    assert got[4][0] == 1 and got[4][1] is not None


def test_vocab_cap_drops_rare_contexts(ray_session):
    # cap keeps only the frequent tokens; rare-context bigrams fall to
    # the add-one floor -(ln(cb+1) - ln(0 + V_capped))
    docs = {1: "a a a a a b", 2: "a a a c"}
    full = _run(docs)
    capped = _run(docs, max_vocab=1)  # keeps only 'a'
    assert full != capped
    for did in docs:
        assert capped[did][0] == full[did][0]  # bigram counts unchanged


def test_bad_params_raise(ray_session):
    import ray

    from rayfts.ops.lm import bigram_lm_scores

    ds = ray.data.from_pandas(pd.DataFrame({"doc_id": [1], "text": ["x"]}))
    with pytest.raises(ValueError):
        bigram_lm_scores(ds, max_vocab=0)


def test_all_empty_text_partition(ray_session):
    # an entire partition of empty/null/whitespace texts must not crash
    # the partial unpack (ADVICE r03: empty path returned a 4-tuple)
    docs = {0: "", 1: None, 2: "   ", 3: "\t\n", 4: ""}
    assert _run(docs) == {i: (0, None) for i in docs}


def test_empty_partition_mixed_with_real(ray_session):
    import ray

    from rayfts.ops.lm import bigram_lm_scores

    df = pd.DataFrame({
        "doc_id": list(range(8)),
        "text": ["", "", "", ""] + ["the cat sat on the mat"] * 4,
    })
    # repartition so at least one block is all-empty
    ds = ray.data.from_pandas(df).repartition(4)
    out = bigram_lm_scores(ds).to_pandas().sort_values("doc_id")
    assert (out["n_bigrams"].to_numpy() == [0, 0, 0, 0, 5, 5, 5, 5]).all()
    assert out["nll"].isna().to_numpy()[:4].all()
    assert out["nll"].notna().to_numpy()[4:].all()
