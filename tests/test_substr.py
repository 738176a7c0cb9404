"""Exact duplicated-substring span detection (rayfts/ops/substr.py):
equality with an in-test brute-force Python reference on planted and
random corpora, scope semantics, interval-merge edge cases, and the
per-doc stats join."""

import collections
import re

import numpy as np
import pandas as pd
import pytest


def _toks(t):
    return [x.lower() for x in re.findall(r"[^\W_]+", t or "", re.UNICODE)]


def _ref_spans(texts_by_id, L, cross_doc=True):
    """Brute-force reference: collect L-gram occurrences, keep grams in
    >=2 distinct docs (or >=2 occurrences), merge per-doc intervals."""
    grams = collections.defaultdict(list)
    for did, t in texts_by_id.items():
        ts = _toks(t)
        for i in range(len(ts) - L + 1):
            grams[tuple(ts[i:i + L])].append((did, i))
    hits = collections.defaultdict(list)
    for occ in grams.values():
        ok = (len({d for d, _ in occ}) >= 2) if cross_doc else (len(occ) >= 2)
        if ok:
            for d, p in occ:
                hits[d].append(p)
    spans = []
    for d, ps in hits.items():
        ps.sort()
        s, e = ps[0], ps[0] + L
        for p in ps[1:]:
            if p <= e:
                e = p + L
            else:
                spans.append((d, s, e))
                s, e = p, p + L
        spans.append((d, s, e))
    return sorted(spans)


def _run(docs, L, scope="cross_doc"):
    import ray

    from rayfts.ops.substr import duplicated_spans

    ds = ray.data.from_pandas(pd.DataFrame(
        {"doc_id": list(docs), "text": list(docs.values())}))
    out = duplicated_spans(ds, min_len=L, scope=scope, num_parts=8).to_pandas()
    if out.empty:
        return []
    return sorted(map(tuple, out[["doc_id", "span_start", "span_end"]]
                      .itertuples(index=False, name=None)))


def test_planted_duplicate_passage(ray_session):
    boiler = "this license text is repeated verbatim across many files ok"
    docs = {
        1: f"alpha beta {boiler} gamma delta",
        2: f"{boiler} other content here entirely different words",
        3: "no shared passage at all in this one document text",
    }
    got = _run(docs, L=5)
    assert got == _ref_spans(docs, 5)
    # the boilerplate span covers its 10 tokens in both docs
    assert any(d == 1 and e - s == 10 for d, s, e in got)
    assert not any(d == 3 for d, _, _ in got)


def test_overlapping_and_touching_windows_fuse(ray_session):
    # two occurrences shifted by one token -> overlapping windows merge
    docs = {
        1: "a b c d e f g h i j",
        2: "x a b c d e y c d e f g z",
    }
    got = _run(docs, L=3)
    assert got == _ref_spans(docs, 3)
    # within doc 1 the duplicated windows [0,3)... merge into big spans
    for d, s, e in got:
        assert e - s >= 3


def test_scope_any_catches_within_doc_repeats(ray_session):
    docs = {
        7: "one two three filler one two three more filler",
        8: "totally unrelated words without any repetition here",
    }
    assert _run(docs, L=3, scope="cross_doc") == []
    got = _run(docs, L=3, scope="any")
    assert got == _ref_spans(docs, 3, cross_doc=False)
    assert {d for d, _, _ in got} == {7}


def test_short_empty_and_null_docs(ray_session):
    import ray

    from rayfts.ops.substr import duplicated_spans

    df = pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "text": ["too short", "too short", "", None],
    })
    out = duplicated_spans(
        ray.data.from_pandas(df), min_len=5, num_parts=4).to_pandas()
    assert len(out) == 0  # docs shorter than L produce no windows


def test_random_corpus_matches_reference(ray_session):
    rng = np.random.default_rng(7)
    vocab = [f"w{i}" for i in range(30)]
    docs = {}
    for d in range(40):
        docs[d] = " ".join(rng.choice(vocab, size=rng.integers(3, 60)))
    for L in (2, 4):
        assert _run(docs, L) == _ref_spans(docs, L), f"L={L}"
        assert (_run(docs, L, scope="any")
                == _ref_spans(docs, L, cross_doc=False)), f"L={L} any"


def test_join_fallover_plan_equals_broadcast_plan(ray_session):
    import ray

    from rayfts.ops.substr import duplicated_spans

    rng = np.random.default_rng(17)
    vocab = [f"w{i}" for i in range(25)]
    docs = {d: " ".join(rng.choice(vocab, size=40)) for d in range(30)}
    ds = ray.data.from_pandas(pd.DataFrame(
        {"doc_id": list(docs), "text": list(docs.values())}))

    def spans(limit):
        out = duplicated_spans(ds, min_len=3, num_parts=8,
                               broadcast_limit=limit).to_pandas()
        if out.empty:
            return []
        return sorted(map(tuple, out[["doc_id", "span_start", "span_end"]]
                          .itertuples(index=False, name=None)))

    ref = _ref_spans(docs, 3)
    assert spans(10_000_000) == ref  # broadcast probe plan
    assert spans(0) == ref           # partitioned-join fall-over plan


def test_dup_span_stats_all_docs_integer_exact(ray_session):
    import ray

    from rayfts.ops.substr import dup_span_stats

    boiler = "shared passage tokens here repeated across docs"
    docs = {
        1: f"{boiler} unique tail one",
        2: f"{boiler} unique tail two",
        3: "independent document with no duplication at all present",
        4: "tiny",
    }
    L = 4
    ref = _ref_spans(docs, L)
    exp = collections.defaultdict(int)
    for d, s, e in ref:
        exp[d] += e - s
    ds = ray.data.from_pandas(pd.DataFrame(
        {"doc_id": list(docs), "text": list(docs.values())}))
    st = dup_span_stats(ds, min_len=L, num_parts=8).to_pandas()
    assert len(st) == len(docs)  # every doc, including span-free ones
    for r in st.itertuples():
        assert r.n_tokens == len(_toks(docs[r.doc_id]))
        assert r.dup_tokens == exp.get(r.doc_id, 0)


def test_bad_scope_raises(ray_session):
    import ray

    from rayfts.ops.substr import duplicated_spans

    ds = ray.data.from_pandas(pd.DataFrame({"doc_id": [1], "text": ["x"]}))
    with pytest.raises(ValueError):
        duplicated_spans(ds, scope="both")
