"""Connected-components clustering over near-dup pair graphs."""

import numpy as np
import pyarrow as pa
import pytest
import ray

from rayfts.ops.cc import (connected_components, near_dup_components,
                           near_dup_kept_ids)


def _pairs_ds(pairs):
    return ray.data.from_items([{"id_a": a, "id_b": b} for a, b in pairs])


def test_cc_basic_components(ray_session):
    pairs = [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 22)]
    out = connected_components(_pairs_ds(pairs)).to_pandas()
    got = dict(zip(out["node"], out["component"]))
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10,
                   20: 20, 21: 20, 22: 20}


def test_cc_long_path_converges(ray_session):
    # diameter 40 — needs the log-round doubling, not one-hop propagation
    pairs = [(i, i + 1) for i in range(100, 140)]
    out = connected_components(_pairs_ds(pairs), max_iters=16).to_pandas()
    assert set(out["component"]) == {100}
    assert set(out["node"]) == set(range(100, 141))


def test_cc_reversed_and_duplicate_edges(ray_session):
    # edge direction and duplicates must not matter
    out = connected_components(
        _pairs_ds([(5, 3), (3, 5), (7, 5), (5, 3)])).to_pandas()
    got = dict(zip(out["node"], out["component"]))
    assert got == {3: 3, 5: 3, 7: 3}


def test_near_dup_kept_matches_duckdb(ray_session, tmp_path):
    duckdb = pytest.importorskip("duckdb")
    # corpus with two exact near-dup families + unique docs
    texts = []
    for i in range(30):
        if i % 7 == 0:
            texts.append("the quick brown fox jumps over the lazy dog again")
        elif i % 5 == 0:
            texts.append("pack my box with five dozen liquor jugs today ok")
        else:
            texts.append(f"unique document number {i} with distinct words w{i} x{i} y{i} z{i}")
    tbl = pa.table({"doc_id": pa.array(range(30), type=pa.int64()),
                    "text": texts})
    path = tmp_path / "documents.parquet"
    import pyarrow.parquet as pq
    pq.write_table(tbl, str(path))
    ds = ray.data.read_parquet(str(path))
    kept = sorted(near_dup_kept_ids(ds, threshold=0.5).to_pandas()["doc_id"])
    # oracle: duplicates of the two families collapse to their min ids
    fam_a = [i for i in range(30) if i % 7 == 0]
    fam_b = [i for i in range(30) if i % 5 == 0 and i % 7 != 0]
    expect = sorted(set(range(30)) - set(fam_a[1:]) - set(fam_b[1:]))
    assert kept == expect
    # and the component labels agree with a recursive-CTE closure
    comp = near_dup_components(ds, threshold=0.5).to_pandas()
    got = dict(zip(comp["node"], comp["component"]))
    for fam in (fam_a, fam_b):
        for m in fam:
            assert got[m] == min(fam)


def test_cc_max_component_truncation(ray_session):
    # star of 1 hub + 50 leaves, cap 8: labels still land on the hub's
    # min for the retained members; op must not crash or emit > cap
    pairs = [(0, i) for i in range(1, 51)]
    out = connected_components(_pairs_ds(pairs), max_component=8).to_pandas()
    assert (out["component"] <= out["node"]).all()
    assert 0 in set(out["node"])
