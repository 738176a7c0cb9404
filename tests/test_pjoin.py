"""Unit tests for the join-free partitioned semi-join primitive
(rayfts/ops/pjoin.py) — the replacement for every former
``Dataset.join`` fall-over call site."""

import numpy as np
import pyarrow as pa
import ray

from rayfts.ops.pjoin import _mix_mod, semi_join_partitioned


def _left(ids, texts):
    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array(ids, type=pa.int64()),
        "text": pa.array(texts),
    }))


def _keys(vals):
    return ray.data.from_arrow(pa.table({
        "need_id": pa.array(vals, type=pa.int64()),
    }))


SCHEMA = {"doc_id": pa.int64(), "text": pa.large_string()}


def test_semi_join_membership(ray_session):
    out = semi_join_partitioned(
        _left([1, 2, 3, 4], ["a", "b", "c", "d"]), _keys([2, 4, 99]),
        left_key="doc_id", right_key="need_id",
        left_schema=SCHEMA, num_parts=8,
    ).take_all()
    got = sorted((r["doc_id"], r["text"]) for r in out)
    assert got == [(2, "b"), (4, "d")]


def test_semi_join_empty_keys(ray_session):
    out = semi_join_partitioned(
        _left([1, 2], ["a", "b"]), _keys([]),
        left_key="doc_id", right_key="need_id",
        left_schema=SCHEMA, num_parts=8,
    ).take_all()
    assert out == []


def test_semi_join_duplicate_keys_keep_rows_once(ray_session):
    # duplicate key values on the right must not duplicate left rows
    out = semi_join_partitioned(
        _left([5, 6], ["x", "y"]), _keys([5, 5, 5]),
        left_key="doc_id", right_key="need_id",
        left_schema=SCHEMA, num_parts=4,
    ).take_all()
    assert [(r["doc_id"], r["text"]) for r in out] == [(5, "x")]


def test_semi_join_casts_string_to_large_string(ray_session):
    # the left text column arrives as plain string; the fixed union
    # schema is large_string — the tag stage must cast, not fail
    out = semi_join_partitioned(
        _left([7], ["hello"]), _keys([7]),
        left_key="doc_id", right_key="need_id",
        left_schema=SCHEMA, num_parts=2,
    )
    tbl = pa.Table.from_pylist(out.take_all())
    assert tbl.num_rows == 1


def test_semi_join_negative_keys(ray_session):
    # negative int64 keys must mix and probe correctly (uint64 wraparound
    # in _mix_mod is deliberate; the probe compares in int64 space)
    out = semi_join_partitioned(
        _left([-3, -2, -1, 0], ["a", "b", "c", "d"]), _keys([-2, 0]),
        left_key="doc_id", right_key="need_id",
        left_schema=SCHEMA, num_parts=4,
    ).take_all()
    assert sorted((r["doc_id"], r["text"]) for r in out) == [
        (-2, "b"), (0, "d")]


def test_semi_join_randomized_matches_isin(ray_session):
    rng = np.random.default_rng(7)
    ids = rng.integers(-(2**40), 2**40, size=10_000, dtype=np.int64)
    keys = rng.choice(ids, size=3_000, replace=True)
    keys[:500] = rng.integers(2**41, 2**42, size=500)  # guaranteed misses
    out = semi_join_partitioned(
        _left(ids.tolist(), [str(i) for i in ids]), _keys(keys.tolist()),
        left_key="doc_id", right_key="need_id",
        left_schema=SCHEMA, num_parts=16,
    ).take_all()
    expect = sorted(int(i) for i in ids[np.isin(ids, keys)])
    assert sorted(r["doc_id"] for r in out) == expect


def test_mix_mod_uniform_and_stable():
    ids = np.arange(100_000, dtype=np.int64)  # worst case: sequential keys
    parts = _mix_mod(ids, 64)
    counts = np.bincount(parts, minlength=64)
    assert counts.max() / counts.mean() < 1.1  # golden mix de-skews
    assert np.array_equal(parts, _mix_mod(ids, 64))  # deterministic
