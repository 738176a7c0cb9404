"""Corpus-wide duplicate-line removal (rayfts/ops/linededup.py):
known-answer dedup semantics, strip-matching, within-doc-only lines
kept, empty/null docs, chunked-broadcast path, and min_docs knob."""

import pandas as pd
import pytest


def _ds(texts, ids=None):
    import ray

    return ray.data.from_pandas(pd.DataFrame({
        "doc_id": ids if ids is not None else list(range(len(texts))),
        "text": texts,
    }))


TEXTS = [
    "keep me\ncookie banner\nunique one",
    "cookie banner\nother text\n\n  cookie banner  ",
    "solo doc line\nrepeated inside\nrepeated inside",
    "",
    None,
]


def test_duplicate_lines_counts(ray_session):
    from rayfts.ops.linededup import duplicate_lines

    df = duplicate_lines(_ds(TEXTS)).to_pandas()
    assert df.to_dict("records") == [
        {"line": "cookie banner", "occ": 3, "ndocs": 2}]


def test_line_dedup_rewrite(ray_session):
    from rayfts.ops.linededup import line_dedup

    out = (line_dedup(_ds(TEXTS)).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert out["text"].tolist() == [
        "keep me\nunique one",          # banner dropped
        "other text\n",                 # both banners (one padded) dropped,
                                        # empty structural line kept
        "solo doc line\nrepeated inside\nrepeated inside",  # 1 doc only
        "",
        "",
    ]
    assert out["n_removed_lines"].tolist() == [1, 2, 0, 0, 0]


def test_min_docs_threshold(ray_session):
    from rayfts.ops.linededup import line_dedup

    out = (line_dedup(_ds(TEXTS), min_docs=3).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    # no line reaches 3 distinct docs -> nothing removed
    assert out["n_removed_lines"].sum() == 0
    assert out["text"].tolist()[0] == TEXTS[0]


def test_chunked_broadcast_path(ray_session):
    """Force chunk_bytes tiny so the duplicate set spans many ray.put
    chunks; result must be identical to the single-chunk path."""
    from rayfts.ops.linededup import line_dedup

    texts = [f"shared {i % 20}\nown {j}" for j, i in
             enumerate(range(200))]
    a = (line_dedup(_ds(texts)).to_pandas()
         .sort_values("doc_id").reset_index(drop=True))
    b = (line_dedup(_ds(texts), chunk_bytes=8).to_pandas()
         .sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)
    # every 'shared k' line recurs across docs -> dropped everywhere
    assert (a["text"] == [f"own {j}" for j in range(200)]).all()
