"""BM25 rank + score equality against an independent pure-Python oracle
(SURVEY.md §5 test plan item 4). All fields < 41 tokens, the region where
fieldnorm quantization is the identity, so scores are exactly computable.
"""

import math
import shutil

import pytest

from rayfts.analysis.analyzer import Analyzer
from rayfts.index.catalog import IndexCatalog
from rayfts.index.schema import FieldDef, IndexSchema

K1, B = 1.2, 0.75

DOCS = [
    {"id": "d0", "body": "the quick brown fox jumps over the lazy dog"},
    {"id": "d1", "body": "the quick brown cat sleeps"},
    {"id": "d2", "body": "a fox and another fox ran across the quick field"},
    {"id": "d3", "body": "dogs and cats living together in the field"},
    {"id": "d4", "body": "quick quick quick brown brown fox"},
    {"id": "d5", "body": "completely unrelated text about parsing manifests"},
    {"id": "d6", "body": "the lazy dog sleeps in the field near the fox"},
]


class Oracle:
    """Independent BM25: token lists -> scores, no shared code with the
    engine beyond the analyzer (which is itself golden-tested)."""

    def __init__(self, docs, field="body"):
        an = Analyzer("en_stem")
        self.toks = [an.tokens(d[field]) for d in docs]
        self.n = len(docs)
        self.avgdl = sum(len(t) for t in self.toks) / self.n

    def score_term(self, term):
        df = sum(1 for t in self.toks if term in t)
        idf = math.log(1 + (self.n - df + 0.5) / (df + 0.5))
        out = {}
        for i, toks in enumerate(self.toks):
            tf = toks.count(term)
            if tf:
                dl = len(toks)
                out[i] = idf * (K1 + 1) * tf / (tf + K1 * (1 - B + B * dl / self.avgdl))
        return out

    def score_or(self, terms):
        acc = {}
        for t in terms:
            for i, s in self.score_term(t).items():
                acc[i] = acc.get(i, 0.0) + s
        return acc

    def topk(self, scores, k):
        return sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]


@pytest.fixture(scope="module")
def index(tmp_path_factory):
    root = tmp_path_factory.mktemp("bm25")
    cat = IndexCatalog(str(root))
    schema = IndexSchema([
        FieldDef("body", "text", indexed=True, record="position",
                 tokenizer="en_stem", stored=True),
        FieldDef("id", "text", indexed=False, stored=True),
    ])
    idx = cat.create_index("bm", schema)
    # split across several segments to exercise searcher-level stats
    idx.add_documents(DOCS[:3])
    idx.add_documents(DOCS[3:5])
    idx.add_documents(DOCS[5:])
    yield idx
    shutil.rmtree(root, ignore_errors=True)


def _id_of(hit):
    return hit["doc"]["id"][0]


def _docnum(hit):
    return int(_id_of(hit)[1:])


def test_single_term_rank_and_scores(index):
    oracle = Oracle(DOCS)
    for term_raw in ["fox", "quick", "field", "dog", "the"]:
        term = Analyzer("en_stem").tokens(term_raw)[0]
        expect = oracle.topk(oracle.score_term(term), 10)
        hits = index.query(term_raw, limit=10)
        got = [(_docnum(h), h["score"]) for h in hits]
        assert [g[0] for g in got] == [e[0] for e in expect], term_raw
        for (gd, gs), (ed, es) in zip(got, expect):
            assert gs == pytest.approx(es, rel=1e-9), (term_raw, gd)


def test_or_query_sum_of_scores(index):
    oracle = Oracle(DOCS)
    expect = oracle.topk(oracle.score_or(["fox", "dog"]), 10)
    hits = index.query("fox dog", limit=10)
    got = [(_docnum(h), h["score"]) for h in hits]
    assert [g[0] for g in got] == [e[0] for e in expect]
    for (gd, gs), (_ed, es) in zip(got, expect):
        assert gs == pytest.approx(es, rel=1e-9)


def test_and_query_intersection_scored(index):
    oracle = Oracle(DOCS)
    s_fox = oracle.score_term("fox")
    s_dog = oracle.score_term("dog")
    both = {i: s_fox[i] + s_dog[i] for i in s_fox if i in s_dog}
    expect = oracle.topk(both, 10)
    hits = index.query("fox AND dog", limit=10)
    got = [(_docnum(h), h["score"]) for h in hits]
    assert [g[0] for g in got] == [e[0] for e in expect]
    for (gd, gs), (_ed, es) in zip(got, expect):
        assert gs == pytest.approx(es, rel=1e-9)


def test_limit_default_is_10_like_reference(index):
    # handles.rs:143 — default limit 10
    hits = index.query("the")
    assert len(hits) <= 10


def test_absent_term_zero_hits(index):
    assert index.query("zzzabsent") == []


def test_tie_break_by_docid_ascending(index, tmp_path):
    cat = IndexCatalog(str(tmp_path))
    schema = IndexSchema([
        FieldDef("body", tokenizer="en_stem"),
        FieldDef("id", indexed=False),
    ])
    idx = cat.create_index("ties", schema)
    # identical docs -> identical scores -> order must be by global docid asc
    idx.add_documents([{"id": f"t{i}", "body": "same exact words"} for i in range(5)])
    hits = idx.query("same", limit=5)
    scores = [h["score"] for h in hits]
    assert len(set(scores)) == 1
    ids = [_id_of(h) for h in hits]
    assert ids == sorted(ids)


def test_scores_beyond_40_tokens_use_quantized_fieldnorm(tmp_path):
    """Docs longer than 40 tokens score with the QUANTIZED document length
    from the tantivy 0.18 fieldnorm table (exact region ends at 40; above,
    dl = table[encode(len)]). The oracle quantizes the same way; avgdl
    stays exact (per-segment token totals are stored unquantized)."""
    import numpy as np

    from rayfts.codec.fieldnorm import FieldNormCodec

    codec = FieldNormCodec(FieldNormCodec.TANTIVY_LIKE)
    an = Analyzer("en_stem")
    docs = [
        {"id": "short", "body": "needle plus a few words"},
        # 57 tokens incl needle -> quantized dl = 56 (id 48)
        {"id": "mid", "body": "needle " + "pad " * 56},
        # 150 tokens -> quantized dl = 144
        {"id": "long", "body": "needle needle " + "pad " * 148},
    ]
    cat = IndexCatalog(str(tmp_path))
    schema = IndexSchema([
        FieldDef("body", "text", indexed=True, record="position",
                 tokenizer="en_stem", stored=True),
        FieldDef("id", "text", indexed=False, stored=True),
    ])
    idx = cat.create_index("q40", schema)
    idx.add_documents(docs)

    toks = [an.tokens(d["body"]) for d in docs]
    lens = [len(t) for t in toks]
    assert lens[1] > 40 and lens[2] > 40
    n = len(docs)
    avgdl = sum(lens) / n
    df = sum(1 for t in toks if "needl" in t)
    idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
    expected = {}
    for i, t in enumerate(toks):
        tf = t.count("needl")
        dl = float(codec.decode(codec.encode(np.array([lens[i]])))[0])
        expected[docs[i]["id"]] = idf * (K1 + 1) * tf / (
            tf + K1 * (1 - B + B * dl / avgdl))
    # sanity: quantization actually differs from the true length
    assert codec.decode_one(int(codec.encode(np.array([lens[2]]))[0])) != lens[2]
    for h in idx.query("needle", limit=10):
        assert h["score"] == pytest.approx(expected[_id_of(h)], rel=1e-9)
