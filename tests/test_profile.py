"""Grouped profiling aggregates (rayfts/ops/profile.py): moment
partials equal exact pandas references; distinct-per-group exact;
partitioning invariance (mergeable partials)."""

import numpy as np
import pandas as pd
import pytest


def _df(n=4000, seed=3):
    rng = np.random.default_rng(seed)
    return pd.DataFrame({
        "k": rng.choice(list("abcd"), n),
        "v": np.round(rng.normal(50, 20, n), 2),
        "u": rng.integers(0, 200, n),
    })


def test_grouped_moments_exact_and_chunk_invariant(ray_session):
    import ray

    from rayfts.ops.profile import grouped_moments

    df = _df()
    df.loc[::97, "v"] = np.nan  # nulls ignored
    exp = {}
    for k, sub in df.groupby("k"):
        sv = np.round(sub["v"].dropna().to_numpy() * 100).astype(np.int64)
        exp[k] = (len(sv), int(sv.sum()), int((sv.astype(object) ** 2).sum()))
    for parts in (1, 7):
        ds = ray.data.from_pandas(df).repartition(parts)
        out = grouped_moments(ds, "k", "v", scale=100).to_pandas()
        got = {r.k: (r.cnt, r.sum_scaled, r.sumsq_scaled)
               for r in out.itertuples()}
        assert got == exp, parts
    # mean / variance derive exactly from the partials
    for k, (cnt, s, sq) in exp.items():
        mean = s / cnt / 100
        assert abs(mean - df[df.k == k]["v"].dropna().map(
            lambda x: round(x, 2)).mean()) < 1e-9


def test_grouped_distinct_exact(ray_session):
    import ray

    from rayfts.ops.profile import grouped_distinct

    df = _df()
    exp = df.groupby("k")["u"].nunique().to_dict()
    for parts in (1, 5):
        out = grouped_distinct(
            ray.data.from_pandas(df).repartition(parts), "k", "u").to_pandas()
        assert {r.k: r.n_distinct for r in out.itertuples()} == exp, parts


def test_moments_bad_scale(ray_session):
    import ray

    from rayfts.ops.profile import grouped_moments

    ds = ray.data.from_pandas(pd.DataFrame({"k": ["a"], "v": [1.0]}))
    with pytest.raises(ValueError):
        grouped_moments(ds, "k", "v", scale=0)


def test_grouped_moments_large_values_exact(ray_session):
    # int64 accumulation keeps exactness where float64 partials lose it
    # (ADVICE r03: 1000 rows of 123456.78 at scale=100 drifted by 3040)
    import ray

    from rayfts.ops.profile import grouped_moments

    df = pd.DataFrame({"k": ["a"] * 1000, "v": [123456.78] * 1000})
    sv = 12345678
    ds = ray.data.from_pandas(df).repartition(1)
    out = grouped_moments(ds, "k", "v", scale=100).to_pandas()
    assert out.loc[0, "cnt"] == 1000
    assert out.loc[0, "sum_scaled"] == sv * 1000
    assert out.loc[0, "sumsq_scaled"] == sv * sv * 1000
