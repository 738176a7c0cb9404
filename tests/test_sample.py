"""Deterministic sampling operators (rayfts/ops/sample.py)."""
import numpy as np
import pandas as pd
import pyarrow as pa

from rayfts.ops.sample import splitmix64


def _docs(n, langs=("en", "fr", "zh")):
    rng = np.random.default_rng(3)
    return pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "lang": pa.array(rng.choice(langs, size=n).tolist(), type=pa.string()),
    })


def test_uniform_sample_rate_and_determinism(ray_session):
    import ray

    from rayfts.ops.sample import deterministic_sample

    t = _docs(20_000)
    ds = ray.data.from_arrow(t)
    kept = deterministic_sample(ds, 10, 100).to_pandas().doc_id.to_numpy()
    # rate: binomial(20000, 0.1) stays within 6 sigma of the mean
    assert abs(kept.size - 2000) < 6 * np.sqrt(20_000 * 0.1 * 0.9)
    # partitioning invariance: same kept set after a repartition
    kept2 = (deterministic_sample(ds.repartition(17), 10, 100)
             .to_pandas().doc_id.to_numpy())
    assert np.array_equal(np.sort(kept), np.sort(kept2))
    # pure function of the hash: matches the numpy definition exactly
    ids = t["doc_id"].to_numpy()
    ref = ids[splitmix64(ids.view(np.uint64)) < np.uint64((10 << 64) // 100)]
    assert np.array_equal(np.sort(kept), ref)


def test_uniform_sample_seed_changes_set(ray_session):
    import ray

    from rayfts.ops.sample import deterministic_sample

    ds = ray.data.from_arrow(_docs(5_000))
    a = set(deterministic_sample(ds, 20, 100, seed=1).to_pandas().doc_id)
    b = set(deterministic_sample(ds, 20, 100, seed=2).to_pandas().doc_id)
    assert a != b
    # overlap of two independent 20% samples is ~4%, far below either set
    assert len(a & b) < min(len(a), len(b)) / 2


def test_stratified_sample_exact_k_and_reference(ray_session):
    import ray

    from rayfts.ops.sample import stratified_sample_k

    t = _docs(9_000)
    out = (stratified_sample_k(ray.data.from_arrow(t).repartition(13),
                               "lang", "doc_id", k=7)
           .to_pandas().sort_values(["lang", "doc_id"]).reset_index(drop=True))
    sizes = out.groupby("lang").size()
    assert (sizes == 7).all()
    # matches the direct numpy reference: k smallest hashes per group
    ids = t["doc_id"].to_numpy()
    langs = np.asarray(t["lang"].to_pylist(), dtype=object)
    h = splitmix64(ids.view(np.uint64))
    for g in np.unique(langs):
        m = langs == g
        expect = ids[m][np.lexsort((ids[m], h[m]))][:7]
        got = out[out.lang == g].doc_id.to_numpy()
        assert np.array_equal(np.sort(expect), got)


def test_stratified_sample_small_groups_kept_whole(ray_session):
    import ray

    from rayfts.ops.sample import stratified_sample_k

    t = pa.table({
        "doc_id": pa.array(np.arange(5, dtype=np.int64)),
        "lang": pa.array(["en", "en", "en", "fr", "fr"]),
    })
    out = stratified_sample_k(ray.data.from_arrow(t), "lang", "doc_id",
                              k=10).to_pandas()
    assert sorted(out.doc_id.tolist()) == [0, 1, 2, 3, 4]


def test_weighted_sample_matches_bigint_reference(ray_session):
    import ray

    from rayfts.ops.sample import splitmix64, weighted_sample

    rng = np.random.default_rng(43)
    ids = np.arange(5000, dtype=np.int64)
    w = rng.integers(0, 3000, size=5000).astype(np.int64)
    ds = ray.data.from_pandas(pd.DataFrame({"doc_id": ids, "wt": w}))
    num, den = 1, 2000
    got = sorted(weighted_sample(ds, "wt", num, den).to_pandas()["doc_id"])
    h = splitmix64(ids.view(np.uint64), 42)
    exp = [int(i) for i in ids
           if int(h[i]) < (int(w[i]) * num << 64) // den]
    assert got == exp
    assert 0 < len(got) < 5000
    # weight >= den/num -> always kept; weight 0 -> never kept
    assert all(int(w[i]) < 2000 or i in set(got) for i in ids)
    assert all(int(w[i]) > 0 or i not in set(got) for i in ids)


def test_weighted_sample_chunking_invariant_and_errors(ray_session):
    import pytest as _pytest
    import ray

    from rayfts.ops.sample import weighted_sample

    df = pd.DataFrame({"doc_id": np.arange(1000, dtype=np.int64),
                       "wt": np.arange(1000, dtype=np.int64) % 50})
    a = sorted(weighted_sample(
        ray.data.from_pandas(df), "wt", 1, 40).to_pandas()["doc_id"])
    b = sorted(weighted_sample(
        ray.data.from_pandas(df).repartition(13), "wt", 1, 40)
        .to_pandas()["doc_id"])
    assert a == b
    with _pytest.raises(ValueError):
        weighted_sample(ray.data.from_pandas(df), "wt", 1, 1 << 40)
    neg = ray.data.from_pandas(pd.DataFrame(
        {"doc_id": [1], "wt": [-5]}))
    with _pytest.raises(Exception):
        weighted_sample(neg, "wt", 1, 10).to_pandas()


def test_stratified_sample_int_key(ray_session):
    # non-string group keys preserve their type (ADVICE r03)
    import ray

    from rayfts.ops.sample import stratified_sample_k

    df = pd.DataFrame({
        "g": np.repeat(np.arange(4, dtype=np.int64), 25),
        "doc_id": np.arange(100, dtype=np.int64),
    })
    out = stratified_sample_k(
        ray.data.from_pandas(df).repartition(3), "g", k=3
    ).to_pandas()
    assert out["g"].dtype == np.int64
    assert out.groupby("g").size().to_dict() == {0: 3, 1: 3, 2: 3, 3: 3}
    # determinism across a different partitioning
    out2 = stratified_sample_k(
        ray.data.from_pandas(df).repartition(7), "g", k=3).to_pandas()
    assert set(map(tuple, out[["g", "doc_id"]].to_numpy())) == \
        set(map(tuple, out2[["g", "doc_id"]].to_numpy()))
