"""Sequence packing / distributed prefix sum (rayfts/ops/pack.py):
equality with a driver-side cumulative sum for every chunking, and the
determinism / partitioning-invariance the op guarantees."""

import re

import numpy as np
import pandas as pd
import pytest


def _ref(df, budget):
    nt = df["text"].map(
        lambda t: len(re.findall(r"[^\W_]+", t or "", re.UNICODE))).to_numpy()
    order = np.argsort(df["doc_id"].to_numpy(), kind="stable")
    ids = df["doc_id"].to_numpy()[order]
    nts = nt[order]
    cb = np.cumsum(nts) - nts
    return pd.DataFrame({"doc_id": ids, "n_tokens": nts,
                         "pack_id": cb // budget, "pack_offset": cb % budget})


def _run(df, budget, **kw):
    import ray

    from rayfts.ops.pack import pack_documents

    out = pack_documents(ray.data.from_pandas(df), budget=budget, **kw)
    return out.to_pandas().sort_values("doc_id").reset_index(drop=True)


def test_matches_reference_and_chunking_invariant(ray_session):
    rng = np.random.default_rng(13)
    df = pd.DataFrame({
        "doc_id": np.arange(400),
        "text": [" ".join(f"w{j}" for j in range(rng.integers(0, 50)))
                 for _ in range(400)],
    })
    ref = _ref(df, 128)
    for chunk_size in (7, 64, 100000):
        got = _run(df, 128, chunk_size=chunk_size)
        pd.testing.assert_frame_equal(got, ref, check_dtype=False,
                                      obj=f"chunk_size={chunk_size}")


def test_sparse_nonconsecutive_ids(ray_session):
    df = pd.DataFrame({
        "doc_id": [5, 1_000_003, 17, 220_001, 9],
        "text": ["a b c", "d e", "f", "g h i j", ""],
    })
    got = _run(df, 4, chunk_size=100)
    pd.testing.assert_frame_equal(got, _ref(df, 4), check_dtype=False)


def test_budget_boundary_exact(ray_session):
    # each doc exactly one budget -> pack_id == rank, offset == 0
    df = pd.DataFrame({"doc_id": [1, 2, 3], "text": ["x y", "p q", "r s"]})
    got = _run(df, 2, chunk_size=2)
    assert got["pack_id"].tolist() == [0, 1, 2]
    assert got["pack_offset"].tolist() == [0, 0, 0]


def test_precomputed_value_col(ray_session):
    df = pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "text": ["ignored"] * 4,
        "nt": [10, 20, 5, 100],
    })
    got = _run(df, 16, chunk_size=2, value_col="nt")
    cb = np.cumsum([10, 20, 5, 100]) - np.array([10, 20, 5, 100])
    assert got["pack_id"].tolist() == list(cb // 16)
    assert got["pack_offset"].tolist() == list(cb % 16)
    assert got["n_tokens"].tolist() == [10, 20, 5, 100]


def test_bad_params_raise(ray_session):
    import ray

    from rayfts.ops.pack import pack_documents

    ds = ray.data.from_pandas(pd.DataFrame({"doc_id": [1], "text": ["x"]}))
    with pytest.raises(ValueError):
        pack_documents(ds, budget=0)
