"""Sliding-window chunking (rayfts/ops/chunk.py): window math,
tail/whole-doc/empty cases, unicode codepoint slicing, overlap
reconstruction, and param validation."""

import pandas as pd
import pytest


def _chunks(texts, **kw):
    import ray

    from rayfts.ops.chunk import chunk_documents

    ds = ray.data.from_pandas(pd.DataFrame({
        "doc_id": list(range(len(texts))), "text": texts}))
    return (chunk_documents(ds, **kw).to_pandas()
            .sort_values(["doc_id", "chunk_id"]).reset_index(drop=True))


def test_window_math(ray_session):
    text = "abcdefghij"  # L=10, chunk=4, overlap=1, stride=3
    out = _chunks([text], chunk_chars=4, overlap=1)
    # ceil((10-1)/3) = 3 chunks at starts 0,3,6
    assert out["chunk_start"].tolist() == [0, 3, 6]
    assert out["chunk_text"].tolist() == ["abcd", "defg", "ghij"]


def test_tail_and_whole_doc(ray_session):
    out = _chunks(["abcdefghijk", "ab", "", None],
                  chunk_chars=4, overlap=1)
    d0 = out[out.doc_id == 0]
    # L=11 -> ceil(10/3)=4 chunks, last is the short tail "jk"
    assert d0["chunk_text"].tolist() == ["abcd", "defg", "ghij", "jk"]
    assert out[out.doc_id == 1]["chunk_text"].tolist() == ["ab"]
    assert (out.doc_id >= 2).sum() == 0  # empty/null -> zero chunks


def test_unicode_codepoints(ray_session):
    out = _chunks(["héllo wörld"], chunk_chars=6, overlap=2)
    assert out["chunk_text"].tolist() == ["héllo ", "o wörl", "rld"]


def test_overlap_reconstruction(ray_session):
    """Adjacent chunks share exactly `overlap` codepoints, so stripping
    the overlap from every chunk after the first rebuilds the doc."""
    text = "".join(chr(97 + i % 26) for i in range(1000))
    out = _chunks([text], chunk_chars=128, overlap=32)
    rebuilt = out["chunk_text"].iloc[0] + "".join(
        c[32:] for c in out["chunk_text"].iloc[1:])
    assert rebuilt == text


def test_param_validation(ray_session):
    import ray

    from rayfts.ops.chunk import chunk_documents

    ds = ray.data.from_pandas(pd.DataFrame({"doc_id": [0], "text": ["x"]}))
    with pytest.raises(ValueError):
        chunk_documents(ds, chunk_chars=4, overlap=4)
    with pytest.raises(ValueError):
        chunk_documents(ds, chunk_chars=4, overlap=-1)
