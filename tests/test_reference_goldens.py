"""The reference's own e2e behaviors, re-expressed on this engine
(SURVEY.md §5; golden sources cited per test)."""

import shutil

import pytest

import rayfts.index.manifest as mf
from rayfts.index.catalog import IndexCatalog


@pytest.fixture()
def catalog(tmp_path):
    return IndexCatalog(str(tmp_path))


def test_catalog_lifecycle(catalog, fixture_schema_json):
    # test/basic.js:7-27 — create x2, has, delete, has
    catalog.create_index("doc1", fixture_schema_json)
    catalog.create_index("doc2", fixture_schema_json)
    assert catalog.index_exists("doc1") and catalog.index_exists("doc2")
    assert catalog.list_indexes() == ["doc1", "doc2"]
    catalog.delete_index("doc1")
    assert not catalog.index_exists("doc1")
    assert catalog.index_exists("doc2")
    with pytest.raises(ValueError):
        catalog.create_index("doc2", fixture_schema_json)


def test_query_mundo_and_snippet_golden(catalog, fixture_schema_json, fixture_docs):
    docs1, _ = fixture_docs
    idx = catalog.create_index("doc", fixture_schema_json)
    idx.add_documents(docs1)
    # test/basic.js:38-42 — query 'mundo' -> exactly doc first2, no snippet
    r = idx.query("mundo")
    assert len(r) == 1
    assert r[0]["doc"]["id"] == ["first2"]
    assert r[0]["snippet"] is None
    # test/basic.js:45-49 — golden snippet string
    r = idx.query("more", snippet_field="body")
    assert len(r) == 1
    assert r[0]["doc"]["id"] == ["first1"]
    assert r[0]["snippet"] == "hi first tell me <b>more</b>"


def test_structured_bool_counts(catalog, fixture_schema_json, fixture_docs):
    docs1, _ = fixture_docs
    idx = catalog.create_index("doc", fixture_schema_json)
    idx.add_documents(docs1)
    # test/basic.js:70-86 — must hi / must_not world -> 1 doc; must_not foo -> 2
    res = idx.query_json({"query": {"bool": {
        "must": [{"term": {"body": "hi"}}],
        "must_not": [{"term": {"title": "world"}}]}}, "limit": 100})
    assert res.hits == 1 and res.docs[0].doc["id"] == ["first2"]
    res = idx.query_json({"query": {"bool": {
        "must": [{"term": {"body": "hi"}}],
        "must_not": [{"term": {"title": "foo"}}]}}, "limit": 100})
    assert res.hits == 2
    assert sorted(d.doc["id"][0] for d in res.docs) == ["first1", "first2"]


def test_segment_exchange(catalog, fixture_schema_json, fixture_docs):
    # test/segments.js:7-45 — build on writer A, copy segment files into B,
    # addSegments -> 4 hits with sorted ids
    docs1, docs2 = fixture_docs
    a = catalog.create_index("a", fixture_schema_json)
    b = catalog.create_index("b", fixture_schema_json)
    a.add_documents(docs1)
    info = b.add_documents(docs2)
    shutil.copytree(
        mf.segment_path(b.path, info.segment_id),
        mf.segment_path(a.path, info.segment_id),
    )
    a.add_segments([info])
    r = a.query("hi", limit=10)
    assert sorted(h["doc"]["id"][0] for h in r) == [
        "first1", "first2", "second1", "second2",
    ]
    # duplicate registration rejected (index.rs:300-316)
    with pytest.raises(ValueError):
        a.add_segments([info])
    # the donor index still serves its docs (index.rs:346-447 move_segment)
    assert len(b.query("second")) == 2
    assert b.query("zzznope") == []


def test_query_multi_per_index_results(catalog, fixture_schema_json, fixture_docs):
    # index.rs:131-146 — same query against N indexes, limit 100, keyed by name
    docs1, docs2 = fixture_docs
    a = catalog.create_index("a", fixture_schema_json)
    b = catalog.create_index("b", fixture_schema_json)
    a.add_documents(docs1)
    b.add_documents(docs2)
    results = catalog.query_multi(["a", "b"], "hi")
    assert [name for name, _ in results] == ["a", "b"]
    assert len(results[0][1]) == 2 and len(results[1][1]) == 2


def test_unknown_fields_dropped_on_ingest(catalog, fixture_schema_json):
    # index.rs:176-179 — unknown fields dropped with a warning, doc indexed
    idx = catalog.create_index("doc", fixture_schema_json)
    idx.add_documents([{"id": "x", "title": "keep me", "bogus": "zap"}])
    r = idx.query("keep")
    assert len(r) == 1 and "bogus" not in r[0]["doc"]


def test_multivalued_fields_roundtrip(catalog):
    # catalog.js:131-144 — array values = multi-valued fields; retrieved
    # docs return every field as an array
    schema = [
        {"name": "tags", "type": "text",
         "options": {"indexing": {"record": "position", "tokenizer": "default"}, "stored": True}},
        {"name": "id", "type": "text", "options": {"indexing": None, "stored": True}},
    ]
    idx = catalog.create_index("mv", schema)
    idx.add_documents([{"id": "m1", "tags": ["alpha", "beta"]},
                       {"id": "m2", "tags": ["gamma"]}])
    r = idx.query("alpha")
    assert len(r) == 1
    assert r[0]["doc"]["tags"] == ["alpha", "beta"]
    assert r[0]["doc"]["id"] == ["m1"]
    assert len(idx.query("beta")) == 1


def test_empty_structured_query_errors(catalog, fixture_schema_json, fixture_docs):
    # search.rs:100-102 — empty query -> error
    from rayfts.query.searcher import QueryError

    idx = catalog.create_index("doc", fixture_schema_json)
    idx.add_documents(fixture_docs[0])
    with pytest.raises(QueryError):
        idx.query_json({"query": {"bool": {}}, "limit": 10})
