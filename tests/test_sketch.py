"""Cardinality sketches (rayfts/ops/sketch.py)."""
import numpy as np
import pyarrow as pa

from rayfts.ops.sketch import hll_estimate, hll_partial


def test_hll_error_bound_and_small_range():
    # standard error is 1.04/sqrt(m); assert within 4 sigma
    m = 1 << 14
    tol = 4 * 1.04 / np.sqrt(m)
    for n in (100, 5_000, 200_000):
        est = hll_estimate(hll_partial(np.arange(n, dtype=np.int64), p=14))
        assert abs(est - n) / n < max(tol, 0.02), (n, est)


def test_hll_merge_is_elementwise_max():
    a = hll_partial(np.arange(0, 5000, dtype=np.int64), p=12)
    b = hll_partial(np.arange(3000, 9000, dtype=np.int64), p=12)
    whole = hll_partial(np.arange(9000, dtype=np.int64), p=12)
    assert np.array_equal(np.maximum(a, b), whole)


def test_approx_distinct_partition_invariant(ray_session):
    import ray

    from rayfts.ops.sketch import approx_distinct

    vals = np.repeat(np.arange(4_000, dtype=np.int64), 3)  # dups across rows
    t = pa.table({"v": pa.array(vals)})
    ds = ray.data.from_arrow(t)
    e1 = approx_distinct(ds, "v", p=12)
    e2 = approx_distinct(ds.repartition(11), "v", p=12)
    assert e1 == e2  # max-merge is order/partitioning independent
    assert abs(e1 - 4_000) / 4_000 < 0.1


def test_count_distinct_exact(ray_session):
    import ray

    from rayfts.ops.sketch import count_distinct

    rng = np.random.default_rng(5)
    vals = rng.integers(0, 1_000, 10_000)
    ds = ray.data.from_arrow(pa.table({"v": pa.array(vals)}))
    assert count_distinct(ds, "v") == len(np.unique(vals))


def test_count_distinct_strings_with_nulls(ray_session):
    import ray

    from rayfts.ops.sketch import count_distinct

    t = pa.table({"s": pa.array(["a", "b", None, "a", None, "c"])})
    ds = ray.data.from_arrow(t)
    # pyarrow unique keeps null as a distinct value; groupby counts it
    assert count_distinct(ds, "s") == 4
