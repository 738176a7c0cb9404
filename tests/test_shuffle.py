"""Deterministic global shuffle (seeded permutation ranks, no sort)."""

import numpy as np
import pyarrow as pa
import ray

from rayfts.ops.sample import splitmix64
from rayfts.ops.shuffle import shuffle_ranks


def _ds(ids, extra=None):
    cols = {"doc_id": pa.array(ids, type=pa.int64())}
    if extra:
        cols.update(extra)
    return ray.data.from_arrow(pa.table(cols))


def _expected(ids, seed):
    ids = np.asarray(ids, dtype=np.int64)
    h = splitmix64(ids.view(np.uint64), seed=seed)
    order = np.lexsort((ids, h))
    want = np.empty(ids.size, dtype=np.int64)
    want[order] = np.arange(ids.size)
    return dict(zip(ids.tolist(), want.tolist()))


def test_ranks_are_exact_permutation(ray_session):
    ids = np.arange(0, 5000, 3, dtype=np.int64)  # sparse, non-contiguous
    got = {r["doc_id"]: r["shuffle_rank"]
           for r in shuffle_ranks(_ds(ids), seed=11).take_all()}
    assert got == _expected(ids, 11)
    assert sorted(got.values()) == list(range(ids.size))


def test_chunk_bits_do_not_change_the_permutation(ray_session):
    """The partitioning parameter is an execution choice, never a
    semantic one — same ranks at any chunk granularity."""
    ids = np.arange(1, 1200, dtype=np.int64)
    base = {r["doc_id"]: r["shuffle_rank"]
            for r in shuffle_ranks(_ds(ids), seed=5, chunk_bits=2).take_all()}
    for bits in (8, 20):
        again = {r["doc_id"]: r["shuffle_rank"]
                 for r in shuffle_ranks(_ds(ids), seed=5,
                                        chunk_bits=bits).take_all()}
        assert again == base


def test_seed_changes_the_permutation(ray_session):
    ids = np.arange(400, dtype=np.int64)
    a = {r["doc_id"]: r["shuffle_rank"]
         for r in shuffle_ranks(_ds(ids), seed=1).take_all()}
    b = {r["doc_id"]: r["shuffle_rank"]
         for r in shuffle_ranks(_ds(ids), seed=2).take_all()}
    assert a != b
    assert sorted(a.values()) == sorted(b.values()) == list(range(400))


def test_keep_cols_ride_along(ray_session):
    ids = np.arange(100, dtype=np.int64)
    labels = pa.array([f"v{i}" for i in ids])
    out = shuffle_ranks(_ds(ids, {"label": labels}), seed=3,
                        keep_cols=("label",)).take_all()
    want = _expected(ids, 3)
    for r in out:
        assert r["label"] == f"v{r['doc_id']}"
        assert r["shuffle_rank"] == want[r["doc_id"]]


def test_write_shuffled_replays_permutation_and_resumes(ray_session, tmp_path):
    """Files read in name order replay the exact seeded permutation;
    a deleted part is reproduced byte-identically on re-run while
    committed parts are skipped."""
    import glob
    import os

    import pyarrow.parquet as pq

    from rayfts.ops.shuffle import write_shuffled

    ids = np.arange(1500, dtype=np.int64)
    ds = _ds(ids, {"text": pa.array([f"doc {i}" for i in ids])})
    out = str(tmp_path / "shuffled")
    summary = write_shuffled(ds, out, seed=9, chunk_bits=4).take_all()
    files = sorted(glob.glob(os.path.join(out, "part-*.parquet")))
    assert len(files) == len(summary) == 16
    cat = pa.concat_tables([pq.read_table(f) for f in files])
    ranks = _expected(ids, 9)
    assert cat["doc_id"].to_pylist() == sorted(
        ids.tolist(), key=lambda i: ranks[i])
    assert cat.num_rows == ids.size

    victim = files[5]
    orig = open(victim, "rb").read()
    os.unlink(victim)
    write_shuffled(ds, out, seed=9, chunk_bits=4).take_all()
    assert open(victim, "rb").read() == orig


def test_auto_chunking_sizes_parts_and_keeps_the_permutation(
        ray_session, tmp_path):
    """chunk_bits=None coarsens the fine count pass to ~target rows per
    chunk: same permutation as any pinned granularity, and the part
    count tracks total_rows / target instead of a fixed 2^bits."""
    import glob
    import os

    import pyarrow.parquet as pq

    from rayfts.ops.shuffle import write_shuffled

    ids = np.arange(4000, dtype=np.int64)
    want = _expected(ids, 7)
    got = {r["doc_id"]: r["shuffle_rank"]
           for r in shuffle_ranks(_ds(ids), seed=7).take_all()}
    assert got == want

    ds = _ds(ids, {"text": pa.array([f"doc {i}" for i in ids])})
    out = str(tmp_path / "auto")
    write_shuffled(ds, out, seed=7).take_all()
    files = sorted(glob.glob(os.path.join(out, "part-*.parquet")))
    # 4000 rows / 64Ki target floors at the 2-chunk minimum
    assert len(files) == 2
    cat = pa.concat_tables([pq.read_table(f) for f in files])
    assert cat["doc_id"].to_pylist() == sorted(
        ids.tolist(), key=lambda i: want[i])
