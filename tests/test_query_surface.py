"""Structured DSL + string grammar coverage: range, fuzzy, regex, all,
facets, sort_by, phrase — each against a brute-force oracle over the raw
docs (SURVEY.md §2.3 operators #15-29)."""

import pytest

from rayfts.analysis.analyzer import Analyzer
from rayfts.index.catalog import IndexCatalog
from rayfts.index.schema import FieldDef, IndexSchema

DOCS = [
    {"id": "a", "body": "alpha beta gamma", "lang": "en", "size": 3, "facet": "/top/en"},
    {"id": "b", "body": "beta gamma delta epsilon", "lang": "de", "size": 4, "facet": "/top/de"},
    {"id": "c", "body": "gamma delta", "lang": "en", "size": 2, "facet": "/top/en"},
    {"id": "d", "body": "zeta eta theta beta", "lang": "fr", "size": 4, "facet": "/top/fr"},
    {"id": "e", "body": "alpha alpha beta", "lang": "de", "size": 3, "facet": "/top/de"},
]


@pytest.fixture(scope="module")
def idx(tmp_path_factory):
    cat = IndexCatalog(str(tmp_path_factory.mktemp("qs")))
    schema = IndexSchema([
        FieldDef("body", "text", tokenizer="default", record="position"),
        FieldDef("lang", "text", tokenizer="raw", record="basic"),
        FieldDef("id", "text", indexed=False),
        FieldDef("size", "u64", indexed=True, stored=True, fast=True),
        FieldDef("facet", "text", tokenizer="raw", record="basic"),
    ])
    h = cat.create_index("q", schema)
    h.add_documents(DOCS[:2])
    h.add_documents(DOCS[2:])
    return h


def ids(res):
    return sorted(d.doc["id"][0] for d in res.docs)


def test_term_dsl_exact_unanalyzed(idx):
    res = idx.query_json({"query": {"term": {"body": "beta"}}, "limit": 100})
    assert ids(res) == ["a", "b", "d", "e"]
    # DSL terms are NOT analyzed: an uppercase term misses the lowercased index
    res = idx.query_json({"query": {"term": {"body": "Beta"}}, "limit": 100})
    assert res.hits == 0


def test_range_term_dict(idx):
    # term range over the body vocabulary: [beta TO delta] inclusive
    res = idx.query_json({"query": {"range": {"body": {"gte": "beta", "lte": "delta"}}}, "limit": 100})
    assert ids(res) == ["a", "b", "c", "d", "e"]
    res = idx.query_json({"query": {"range": {"body": {"gt": "delta", "lt": "zeta"}}}, "limit": 100})
    # (delta, zeta) -> epsilon, eta, gamma, theta
    assert ids(res) == ["a", "b", "c", "d"]
    assert all(d.score == 1.0 for d in res.docs)  # constant score


def test_range_numeric_fast_field(idx):
    res = idx.query_json({"query": {"range": {"size": {"gte": 4}}}, "limit": 100})
    assert ids(res) == ["b", "d"]


def test_fuzzy(idx):
    res = idx.query_json({"query": {"fuzzy": {"body": {"value": "bet", "distance": 1}}}, "limit": 100})
    # 'beta' at distance 1; 'zeta'/'eta' at distance 2 excluded
    assert ids(res) == ["a", "b", "d", "e"]
    res = idx.query_json({"query": {"fuzzy": {"body": {"value": "game", "distance": 2}}}, "limit": 100})
    assert ids(res) == ["a", "b", "c"]  # gamma


def test_fuzzy_transposition():
    from rayfts.query.exec import _levenshtein_within

    assert _levenshtein_within("abcd", "abdc", 1, True)
    assert not _levenshtein_within("abcd", "abdc", 1, False)
    assert _levenshtein_within("abcd", "abdc", 2, False)


def test_regex_full_match(idx):
    res = idx.query_json({"query": {"regex": {"body": "ga.*a"}}, "limit": 100})
    assert ids(res) == ["a", "b", "c"]
    res = idx.query_json({"query": {"regex": {"body": ".*eta"}}, "limit": 100})
    # beta, zeta, eta, theta
    assert ids(res) == ["a", "b", "d", "e"]


def test_all_query(idx):
    res = idx.query_json({"query": "all", "limit": 100})
    assert res.hits == 5 and all(d.score == 1.0 for d in res.docs)


def test_raw_query_falls_back_to_grammar(idx):
    res = idx.query_json({"query": {"raw": "body:alpha"}, "limit": 100})
    assert ids(res) == ["a", "e"]


def test_sort_by_fast_field(idx):
    # search.rs:19-29,67-77 — order by fast value, score = value as float
    res = idx.query_json({"query": "all", "limit": 3, "sort_by": "size"})
    assert [d.score for d in res.docs] == [4.0, 4.0, 3.0]


def test_facet_counts(idx):
    res = idx.query_json({"query": {"term": {"body": "beta"}}, "limit": 100,
                          "facets": {"facet": ["/top"]}})
    got = {f["term"]: f["count"] for f in res.facets}
    assert got == {"/top/en": 1, "/top/de": 2, "/top/fr": 1}


def test_phrase_dsl(idx):
    res = idx.query_json({"query": {"phrase": {"body": {"terms": ["beta", "gamma"]}}}, "limit": 100})
    assert ids(res) == ["a", "b"]
    res = idx.query_json({"query": {"phrase": {"body": {"terms": ["gamma", "beta"]}}}, "limit": 100})
    assert res.hits == 0


def test_grammar_features(idx):
    s = idx.searcher()
    # explicit OR
    assert s.count("body:alpha OR body:delta") == 4
    # grouping + AND
    assert s.count("(alpha OR delta) AND beta") == 3
    # range grammar
    assert s.count("body:[beta TO delta]") == 5
    assert s.count("size:[4 TO *]") == 2
    # must_not alone pairs with All
    assert s.count("-alpha") == 3
    # multi-token word becomes a phrase on position fields
    assert s.count("beta-gamma") == 2


def test_grammar_analyzes_terms(idx):
    # grammar terms go through the field analyzer (lowercase here)
    assert idx.searcher().count("ALPHA") == 2


def test_parse_errors(idx):
    from rayfts.query.parser import QueryParseError

    with pytest.raises(QueryParseError):
        idx.searcher().count("unknownfield:foo")
    with pytest.raises(QueryParseError):
        idx.searcher().count("(unbalanced")


def test_separator_only_query_matches_nothing(idx):
    assert idx.searcher().count("!!! ...") == 0


def test_query_multi_per_index_results(idx, tmp_path_factory):
    """#14 query_multi: same string against N named indexes; results are
    per-index lists keyed by name, NOT globally merged (handles.rs:157-176)."""
    cat = idx.catalog
    schema = idx.manifest.schema
    other = cat.create_index("q2", schema)
    other.add_documents([
        {"id": "x", "body": "beta only here", "lang": "en", "size": 1, "facet": "/top/en"},
    ])
    res = cat.query_multi(["q", "q2"], "beta")
    assert [name for name, _ in res] == ["q", "q2"]
    by_name = dict(res)
    assert {h["doc"]["id"][0] for h in by_name["q"]} == {"a", "b", "d", "e"}
    assert {h["doc"]["id"][0] for h in by_name["q2"]} == {"x"}


def test_phrase_three_terms(idx):
    r = idx.query_json({"query": {"phrase": {"body": {"terms": ["beta", "gamma", "delta"]}}}})
    assert ids(r) == ["b"]


def test_removed_long_token_keeps_position_gap(tmp_path_factory):
    """RemoveLong drops the token but PRESERVES ordinals (tantivy filter
    semantics, SURVEY §8.1): 'alpha <45-byte-token> beta' must NOT match
    the phrase "alpha beta" because their positions are 0 and 2."""
    cat = IndexCatalog(str(tmp_path_factory.mktemp("gap")))
    schema = IndexSchema([
        FieldDef("body", "text", tokenizer="default", record="position"),
        FieldDef("id", "text", indexed=False),
    ])
    h = cat.create_index("g", schema)
    h.add_documents([
        {"id": "gap", "body": "alpha " + "x" * 45 + " beta"},
        {"id": "adj", "body": "alpha beta"},
    ])
    r = h.query_json({"query": {"phrase": {"body": {"terms": ["alpha", "beta"]}}}})
    assert ids(r) == ["adj"]
    # both docs still match the bare AND
    r2 = h.query_json({"query": {"bool": {"must": [
        {"term": {"body": "alpha"}}, {"term": {"body": "beta"}}]}}})
    assert ids(r2) == ["adj", "gap"]


def test_wand_pruned_union_matches_naive(ray_session, tmp_path_factory):
    """Block-max pruned top-k (#24 + north star WAND) returns exactly the
    same ranked (score, doc) list as the unpruned union on a corpus large
    enough that pruning actually triggers."""
    import glob

    from rayfts.index.build import build_index
    from rayfts.index.schema import FieldDef as F, IndexSchema as S
    from rayfts.query.ast import Bool, Term
    from rayfts.query.searcher import Searcher

    from rayfts.corpus import generate_corpus

    corpus = generate_corpus("/tmp/rayfts_test/corpus-wand", 4000, seed=7, use_ray=False)
    files = sorted(glob.glob(corpus + "/part-*.parquet"))
    schema = S([
        F("content", "text", tokenizer="en_stem", record="position"),
        F("path", "text", indexed=False),
    ])
    path = str(tmp_path_factory.mktemp("wand") / "idx")
    build_index(files, path, schema, content_col="content", key_cols=["path"])
    s = Searcher(path)
    q = Bool(should=[Term("content", t) for t in ["the", "if", "match", "ident42"]])
    pruned = s.top_k(q, 10)
    gids, scores = s.matches(q)  # exhaustive scoring
    import numpy as np

    order = np.lexsort((gids, -scores))[:10]
    naive = [(round(float(scores[i]), 6), int(gids[i])) for i in order]
    got = [(round(h.score, 6), int(h.doc_id)) for h in pruned]
    assert got == naive


def test_parser_fuzz_never_crashes():
    """Property: the string-grammar parser either returns a Query or raises
    QueryParseError — no other exception for arbitrary input."""
    from hypothesis import given, settings, strategies as st

    from rayfts.query.parser import QueryParseError, QueryParser
    from rayfts.query.ast import Query

    schema = IndexSchema([
        FieldDef("body", "text", tokenizer="default", record="position"),
        FieldDef("size", "u64", indexed=True, stored=True, fast=True),
    ])
    parser = QueryParser(schema)

    @settings(max_examples=200, deadline=None)
    @given(st.text(max_size=40))
    def check(s):
        try:
            q = parser.parse(s)
        except QueryParseError:
            return
        assert isinstance(q, Query)

    check()
