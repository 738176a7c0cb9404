"""Capstone integration: the full training-data assembly chained over
real sf0.001 documents — prepare (gate/line-dedup/decontam/exact-dedup)
-> DSIR selection -> sequence packing -> resumable shuffled write. Each
op is verified individually elsewhere; this guards the COMPOSITION:
column contracts between stages, laziness, and end-state invariants."""

import glob
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray

SF = "/root/testdata/sf0.001"


def test_end_to_end_training_data_run(ray_session, tmp_path):
    from rayfts.ops.dsir import dsir_select
    from rayfts.ops.pack import pack_documents
    from rayfts.ops.prep import prepare_corpus
    from rayfts.ops.shuffle import write_shuffled

    docs = ray.data.read_parquet(os.path.join(SF, "documents.parquet")) \
        .select_columns(["doc_id", "text", "lang"])
    bench = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([10**9], type=pa.int64()),
        "text": pa.array(["held out benchmark sentence nothing shares"]),
    }))

    # 1) prepare: rewritten text + n_removed_lines, survivors only
    prepared = prepare_corpus(docs, bench)
    n_prepared = prepared.count()
    assert 0 < n_prepared <= docs.count()

    # 2) DSIR: select the half closest to the English target domain
    target = docs.filter(expr="lang == 'en'")
    n_sel = max(10, n_prepared // 2)
    selected_ids = {r["doc_id"] for r in
                    dsir_select(prepared, target, n_sel).take_all()}
    assert len(selected_ids) == min(n_sel, n_prepared)

    # 3) keep selected rows (broadcast semi-join, the repo's idiom)
    ids_sorted = np.sort(np.fromiter(selected_ids, dtype=np.int64))
    ref = ray.put(ids_sorted)

    def pick(b: pa.Table) -> pa.Table:
        wanted = ray.get(ref)
        vals = b["doc_id"].to_numpy(zero_copy_only=False)
        pos = np.clip(np.searchsorted(wanted, vals), 0, wanted.size - 1)
        return b.filter(pa.array(wanted[pos] == vals))

    kept = prepared.map_batches(pick, batch_format="pyarrow")

    # 4) pack: every kept doc gets a (pack_id, pack_offset) placement
    packs = pack_documents(kept, budget=512).take_all()
    assert {r["doc_id"] for r in packs} == selected_ids
    by_id = {r["doc_id"]: r for r in packs}
    ordered = sorted(packs, key=lambda r: r["doc_id"])
    cum = 0
    for r in ordered:  # placement = exact prefix sum in id order
        assert r["pack_id"] == cum // 512 and r["pack_offset"] == cum % 512
        cum += r["n_tokens"]

    # 5) shuffled, resumable write of the kept corpus
    out = str(tmp_path / "shuffled")
    write_shuffled(kept, out, seed=1, chunk_bits=3).take_all()
    files = sorted(glob.glob(os.path.join(out, "part-*.parquet")))
    cat = pa.concat_tables([pq.read_table(f) for f in files],
                           promote_options="default")
    assert set(cat["doc_id"].to_pylist()) == selected_ids
    assert set(cat.column_names) >= {"doc_id", "text", "n_removed_lines"}
    # the shuffled order is a permutation, not id order
    ids_in_file_order = cat["doc_id"].to_pylist()
    assert ids_in_file_order != sorted(ids_in_file_order)


def test_chain_over_large_string_column(ray_session, tmp_path):
    """Big text columns are legitimately ``large_string`` at scale (Arrow
    promotes >2 GiB string blocks); every op in the chain must accept
    them. Regression: line_dedup's rewrite used a plain-string join
    separator, and binary_join has no (list<large_string>, string)
    kernel."""
    import pyarrow.compute as pc

    from rayfts.ops.dsir import dsir_select
    from rayfts.ops.pack import pack_documents
    from rayfts.ops.prep import prepare_corpus
    from rayfts.ops.shuffle import write_shuffled

    t = pq.read_table(os.path.join(SF, "documents.parquet"),
                      columns=["doc_id", "text", "lang"])
    t = t.set_column(t.column_names.index("text"), "text",
                     pc.cast(t["text"], pa.large_string()))
    docs = ray.data.from_arrow(t)
    bench = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([10**9], type=pa.int64()),
        "text": pa.array(["held out benchmark sentence nothing shares"],
                         type=pa.large_string()),
    }))
    prepared = prepare_corpus(docs, bench)
    n = prepared.count()
    assert 0 < n <= t.num_rows
    target = docs.filter(expr="lang == 'en'")
    sel = dsir_select(prepared, target, max(10, n // 2))
    assert sel.count() == min(max(10, n // 2), n)
    assert pack_documents(prepared, budget=512).count() == n
    out = str(tmp_path / "ls-shuffled")
    write_shuffled(prepared, out, seed=1, chunk_bits=3).take_all()
    files = glob.glob(os.path.join(out, "part-*.parquet"))
    assert sum(pq.read_metadata(f).num_rows for f in files) == n
