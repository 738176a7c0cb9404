"""Exact distributed quantiles (rayfts/ops/quantile.py): the iterative
histogram-refinement selection must equal a driver-side sort at every
tested parameterization (bins, candidate_cap small enough to force many
refinement iterations), including duplicate-heavy, all-equal, and
adversarially-close float distributions."""

import math

import numpy as np
import pandas as pd
import pytest


def _ref(vals, qs):
    arr = np.sort(np.asarray(
        [v for v in vals if v is not None and not np.isnan(v)], dtype=float))
    return [float(arr[max(1, math.ceil(q * arr.size)) - 1]) for q in qs]


def _run(vals, qs, **kw):
    import ray

    from rayfts.ops.quantile import exact_quantiles

    ds = ray.data.from_pandas(pd.DataFrame(
        {"value": pd.array(vals, dtype="Float64").astype(float)}))
    t = exact_quantiles(ds, "value", qs, **kw)
    return list(t["value"].to_numpy())


def test_random_matches_sorted_reference(ray_session):
    rng = np.random.default_rng(11)
    vals = rng.lognormal(3.0, 1.5, size=20_000)
    qs = [0.0, 0.01, 0.25, 0.5, 0.75, 0.99, 1.0]
    # cap far below n forces several refinement iterations
    got = _run(vals, qs, bins=32, candidate_cap=50)
    assert got == _ref(vals, qs)


def test_duplicate_heavy_distribution(ray_session):
    rng = np.random.default_rng(5)
    # 90% of mass on 3 values -> buckets that never fall under the cap
    # until the float-resolution guard collapses them
    vals = np.concatenate([
        np.full(9000, 7.5), np.full(5000, 7.5000000001), np.full(4000, -1.0),
        rng.uniform(-10, 10, 2000)])
    rng.shuffle(vals)
    qs = [0.1, 0.5, 0.6, 0.9]
    got = _run(vals, qs, bins=16, candidate_cap=10)
    assert got == _ref(vals, qs)


def test_all_equal_single_and_nulls(ray_session):
    assert _run([5.0] * 997, [0.25, 1.0], bins=4, candidate_cap=1) == [5.0, 5.0]
    assert _run([42.0], [0.0, 0.5, 1.0]) == [42.0] * 3
    vals = [3.0, None, 1.0, None, 2.0]
    assert _run(vals, [0.5], bins=4, candidate_cap=1) == _ref(vals, [0.5])


def test_negative_and_mixed_sign_range(ray_session):
    rng = np.random.default_rng(3)
    vals = rng.normal(-50, 200, size=5000)
    qs = [0.05, 0.5, 0.95]
    assert _run(vals, qs, bins=64, candidate_cap=20) == _ref(vals, qs)


def test_result_invariant_to_bins_and_cap(ray_session):
    rng = np.random.default_rng(19)
    vals = np.round(rng.exponential(30, 8000), 2)  # many exact ties
    qs = [0.5, 0.9]
    ref = _ref(vals, qs)
    for bins, cap in [(8, 5), (128, 1000), (4096, 65536)]:
        assert _run(vals, qs, bins=bins, candidate_cap=cap) == ref, (bins, cap)


def test_grouped_matches_reference(ray_session):
    import ray

    from rayfts.ops.quantile import grouped_quantiles

    rng = np.random.default_rng(23)
    df = pd.DataFrame({
        "k": rng.choice(list("abcd"), 3000),
        "value": rng.uniform(0, 100, 3000),
    })
    qs = [0.25, 0.5, 0.75]
    out = (grouped_quantiles(ray.data.from_pandas(df), "k", "value", qs)
           .to_pandas().sort_values(["k", "q"]).reset_index(drop=True))
    for k, sub in df.groupby("k"):
        exp = _ref(sub["value"].to_numpy(), qs)
        got = out[out["k"] == k]["value"].tolist()
        assert got == exp, k


def test_infinities_are_ordered_values(ray_session):
    # quantile_disc treats +/-inf as ordered extremes; the refinement
    # loop must resolve them without NaN edges (review finding)
    rng = np.random.default_rng(29)
    vals = np.concatenate([
        np.full(50, -np.inf), rng.uniform(0, 10, 500), np.full(200, np.inf)])
    rng.shuffle(vals)
    qs = [0.01, 0.5, 0.95]
    got = _run(vals, qs, bins=8, candidate_cap=10)
    assert got == _ref(vals, qs)
    assert got[0] == -np.inf and got[2] == np.inf
    # huge finite range: (hi - lo) alone would overflow to inf
    vals2 = np.array([-1.6e308, 0.0, 1.0, 2.0, 1.6e308] * 40)
    assert _run(vals2, [0.5], bins=16, candidate_cap=3) == _ref(vals2, [0.5])


def test_grouped_all_null_group_kept_as_null(ray_session):
    import ray

    from rayfts.ops.quantile import grouped_quantiles

    df = pd.DataFrame({
        "k": ["a"] * 4 + ["b"] * 3,
        "value": [1.0, 2.0, 3.0, 4.0, None, None, None],
    })
    out = (grouped_quantiles(ray.data.from_pandas(df), "k", "value", [0.5])
           .to_pandas().sort_values("k").reset_index(drop=True))
    # SQL semantics: group 'b' exists with a NULL quantile
    assert out["k"].tolist() == ["a", "b"]
    assert out["value"].iloc[0] == 2.0
    assert pd.isna(out["value"].iloc[1])


def test_bad_qs_raise(ray_session):
    import ray

    from rayfts.ops.quantile import exact_quantiles, grouped_quantiles

    ds = ray.data.from_pandas(pd.DataFrame({"value": [1.0], "k": ["a"]}))
    with pytest.raises(ValueError):
        exact_quantiles(ds, "value", [0.5, 1.5])
    with pytest.raises(ValueError):
        grouped_quantiles(ds, "k", "value", [])


def test_empty_input_returns_empty(ray_session):
    import ray

    from rayfts.ops.quantile import exact_quantiles

    ds = ray.data.from_pandas(pd.DataFrame({"value": pd.array([None, None], dtype="Float64").astype(float)}))
    out = exact_quantiles(ds, "value", [0.5])
    assert out.num_rows == 0
