"""Benchmark decontamination — the "drop training documents that
overlap the test set" stage every serious LLM data pipeline runs
(n-gram overlap filtering as described for GPT-3, PaLM and Llama
training sets; Dolma's public pipeline ships the same shape).

Semantics: a corpus document is contaminated iff it shares at least
one token ``k``-gram (default 8, the published convention) with any
benchmark document. Matching runs over the SAME rolling-hash shingle
space as the dedup family (``rayfts.ops.dedup._ShingleStage``: md5
token hashes, mod-2^64 polynomial windows, docs shorter than ``k``
hash as one whole-doc window), so the DuckDB oracle reproduces every
hash bit-for-bit.

Distributed shape (the benchmark side is SMALL by definition — that is
the whole point of a held-out set):

1. **benchmark set build**: one streaming pass over the benchmark
   Dataset collecting its UNIQUE shingle hashes; the set is bounded by
   ``max_bench_shingles`` (loud error beyond — a "benchmark" at corpus
   scale is a misuse) and broadcast once via ``ray.put`` as a sorted
   uint64 array.
2. **corpus pass**: stateless vectorized ``map_batches`` — per-doc
   unique shingles, one ``searchsorted`` membership probe against the
   broadcast array, per-doc overlap counts via ``bincount``. No
   shuffle, no join; the corpus streams through exactly once.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

from rayfts.ops.dedup import _ShingleStage

__all__ = ["benchmark_shingles", "decontaminate_stats", "decontaminate"]


def benchmark_shingles(bench_ds, col: str = "text", k: int = 8,
                       max_bench_shingles: int = 1 << 24) -> np.ndarray:
    """Sorted unique shingle hashes of the benchmark Dataset (driver
    array, bounded by ``max_bench_shingles`` — ~128 MB at the cap)."""
    stage_kw = {"k": k}

    def uniq_sh(b: pa.Table) -> pa.Table:
        st = _ShingleStage(**stage_kw)
        s, _counts, _n = st._unique_shingles(b[col])
        return pa.table({"sh": pa.array(np.unique(s).astype(np.int64))})

    parts = []
    total = 0
    for b in (bench_ds.select_columns([col])
              .map_batches(uniq_sh, batch_format="pyarrow")
              .iter_batches(batch_format="pyarrow")):
        a = b["sh"].to_numpy(zero_copy_only=False)
        total += a.size
        if total > max_bench_shingles:
            raise ValueError(
                f"benchmark shingle set exceeds max_bench_shingles="
                f"{max_bench_shingles}; a benchmark this large is a misuse "
                "— split it or raise the cap explicitly")
        parts.append(a)
    if not parts:
        return np.empty(0, dtype=np.uint64)
    return np.unique(np.concatenate(parts).astype(np.uint64))


def decontaminate_stats(ds, bench_ds, col: str = "text",
                        id_col: str = "doc_id", k: int = 8,
                        max_bench_shingles: int = 1 << 24):
    """Lazy Dataset of ``(id_col, n_shingles, n_overlap, contaminated)``
    — per corpus doc, its unique-shingle count, how many of those occur
    in the benchmark set, and the drop verdict (``n_overlap > 0``)."""
    bench = benchmark_shingles(bench_ds, col=col, k=k,
                               max_bench_shingles=max_bench_shingles)
    bench_ref = ray.put(bench)
    stage_kw = {"k": k}

    def probe(b: pa.Table) -> pa.Table:
        bset = ray.get(bench_ref)
        st = _ShingleStage(**stage_kw)
        s, counts, n = st._unique_shingles(b[col])
        if bset.size and s.size:
            pos = np.clip(np.searchsorted(bset, s), 0, bset.size - 1)
            hit = (bset[pos] == s).astype(np.int64)
        else:
            hit = np.zeros(s.size, dtype=np.int64)
        doc_idx = np.repeat(np.arange(n, dtype=np.int64), counts)
        overlap = np.bincount(doc_idx, weights=hit, minlength=n).astype(np.int64)
        return pa.table({
            id_col: b[id_col],
            "n_shingles": pa.array(counts),
            "n_overlap": pa.array(overlap),
            "contaminated": pa.array(overlap > 0),
        })

    return ds.select_columns([id_col, col]).map_batches(
        probe, batch_format="pyarrow")


def decontaminate(ds, bench_ds, col: str = "text", id_col: str = "doc_id",
                  k: int = 8, max_bench_shingles: int = 1 << 24):
    """The filtering form: corpus rows minus contaminated docs. Two
    corpus passes (stats, then a broadcast-id semi-difference would
    need the drop set — instead the probe is re-run inline so the
    pipeline stays a single streaming pass over each row's own text:
    a row's verdict depends only on its own shingles and the broadcast
    benchmark set)."""
    bench = benchmark_shingles(bench_ds, col=col, k=k,
                               max_bench_shingles=max_bench_shingles)
    bench_ref = ray.put(bench)
    stage_kw = {"k": k}

    def keep_clean(b: pa.Table) -> pa.Table:
        bset = ray.get(bench_ref)
        st = _ShingleStage(**stage_kw)
        s, counts, n = st._unique_shingles(b[col])
        if bset.size and s.size:
            pos = np.clip(np.searchsorted(bset, s), 0, bset.size - 1)
            hit = (bset[pos] == s).astype(np.int64)
        else:
            hit = np.zeros(s.size, dtype=np.int64)
        doc_idx = np.repeat(np.arange(n, dtype=np.int64), counts)
        overlap = np.bincount(doc_idx, weights=hit, minlength=n)
        return b.filter(pa.array(overlap == 0))

    return ds.map_batches(keep_clean, batch_format="pyarrow")
