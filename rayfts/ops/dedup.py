"""Deduplication operators for web-scale corpora.

- exact_dedup:   sha256 hash-partition + per-group first-wins
- minhash_lsh:   shingle -> minhash signature -> banded LSH buckets ->
                 candidate pairs -> exact-Jaccard verification
- simhash:       64-bit simhash + banded hamming-neighbor candidates
- embedding near-dup lives in rayfts.ops.ann (cosine threshold)

Shapes are designed for the 100 TB case: every per-doc computation is a
stateless ``map_batches``; the only wide steps are groupbys on
uniformly-distributed hash keys (content hash / band hash), so no skew;
candidate verification touches only the candidate rows (semi-join via a
broadcast id set, not a shuffle join).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray

from rayfts.ops.textstats import _token_hashes, _tokens

# -- exact -----------------------------------------------------------------


def add_sha_batch(batch: pa.Table, col: str) -> pa.Table:
    shas = [
        hashlib.sha256(("" if v is None else str(v)).encode()).hexdigest()
        for v in batch[col].to_pylist()
    ]
    return batch.append_column("__sha", pa.array(shas, type=pa.string()))


def _combine_min_per_sha(batch: pa.Table, id_col: str) -> pa.Table:
    """Per-batch combiner: keep the min-id row per sha WITHIN the batch —
    vectorized (sort + run-boundary take), no Python loop. Shrinks the
    shuffle to at most one row per (batch, distinct sha)."""
    order = pc.sort_indices(
        batch, sort_keys=[("__sha", "ascending"), (id_col, "ascending")]
    )
    sorted_b = batch.take(order)
    shas = sorted_b["__sha"].to_numpy(zero_copy_only=False)
    first = np.empty(len(shas), dtype=bool)
    if len(shas):
        first[0] = True
        first[1:] = shas[1:] != shas[:-1]
    return sorted_b.filter(pa.array(first))


def exact_dedup_ids(ds, col: str = "text", id_col: str = "doc_id"):
    """Scalable exact dedup: per-batch vectorized combiner, then a NATIVE
    ``groupby(sha).min(id)`` aggregate (no per-group Python call — at
    10^12 rows a map_groups callback per distinct document would dominate).
    Returns a Dataset of kept ``id_col`` values (one per distinct content).
    Uniform sha keys -> skew-free shuffle."""
    return (
        ds.map_batches(lambda b: add_sha_batch(b, col), batch_format="pyarrow")
        .map_batches(lambda b: _combine_min_per_sha(b, id_col), batch_format="pyarrow")
        .select_columns(["__sha", id_col])
        .groupby("__sha")
        .min(id_col)
        .select_columns([f"min({id_col})"])
        .rename_columns({f"min({id_col})": id_col})
    )


def exact_dedup(ds, col: str = "text", id_col: str = "doc_id"):
    """Keep the smallest-``id_col`` FULL row per distinct ``col`` value.

    Kept-id resolution is the scalable :func:`exact_dedup_ids` aggregate;
    row recovery is a broadcast semi-join on the kept-id set (``ray.put``
    once, probed per batch). For corpora whose kept-id set exceeds driver
    memory, consume :func:`exact_dedup_ids` directly (ids stream out as a
    Dataset) and recover rows with a partitioned join instead."""
    kept = exact_dedup_ids(ds, col, id_col)
    ids = np.sort(
        np.concatenate([
            b[id_col].to_numpy(zero_copy_only=False)
            for b in kept.iter_batches(batch_format="pyarrow")
        ] or [np.empty(0, np.int64)])
    )
    ids_ref = ray.put(ids)

    def pick(batch: pa.Table) -> pa.Table:
        wanted = ray.get(ids_ref)
        vals = batch[id_col].to_numpy(zero_copy_only=False)
        pos = np.searchsorted(wanted, vals)
        pos[pos >= wanted.size] = 0
        mask = wanted[pos] == vals if wanted.size else np.zeros(len(vals), bool)
        return batch.filter(pa.array(mask))

    return ds.map_batches(pick, batch_format="pyarrow")


# -- minhash LSH -----------------------------------------------------------

_MERSENNE = np.uint64((1 << 61) - 1)


def _perm_params(num_perm: int, seed: int = 42) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, size=num_perm, dtype=np.uint64)
    b = rng.integers(0, _MERSENNE, size=num_perm, dtype=np.uint64)
    return a, b


def shingle_hashes(text: str, k: int = 3) -> np.ndarray:
    """Hashes of token k-gram shingles (uint64, unique)."""
    toks = _tokens(text)
    if len(toks) < k:
        joined = ["\x1f".join(toks)] if toks else []
    else:
        joined = ["\x1f".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
    if not joined:
        return np.empty(0, dtype=np.uint64)
    return np.unique(_token_hashes(joined))


def minhash_signature(sh: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """num_perm-wide minhash of a shingle-hash set (universal hashing
    (a*x+b) mod 2^61-1, vectorized num_perm x n)."""
    if sh.size == 0:
        return np.full(a.size, np.iinfo(np.uint64).max, dtype=np.uint64)
    # (P, n) = a[:,None]*sh[None,:] + b — mod-2^64 wraparound then mod mersenne
    prod = a[:, None] * sh[None, :] + b[:, None]
    prod = (prod & _MERSENNE) + (prod >> np.uint64(61))
    prod = np.where(prod >= _MERSENNE, prod - _MERSENNE, prod)
    return prod.min(axis=1)


class MinHashStage:
    """Actor-pool stage: permutation params built once per actor."""

    def __init__(self, col: str = "text", num_perm: int = 64, k: int = 3, seed: int = 42):
        self.col = col
        self.k = k
        self.a, self.b = _perm_params(num_perm, seed)

    def __call__(self, batch: pa.Table) -> pa.Table:
        sigs = [
            minhash_signature(shingle_hashes(t or "", self.k), self.a, self.b)
            for t in batch[self.col].to_pylist()
        ]
        arr = pa.array([s.astype(np.int64).tolist() for s in sigs],
                       type=pa.list_(pa.int64()))
        return batch.append_column("minhash", arr)


def explode_bands(batch: pa.Table, bands: int, id_col: str = "doc_id") -> pa.Table:
    """(doc) -> (band_id, band_hash, doc_id) rows for the LSH groupby."""
    sigs = batch["minhash"].to_pylist()
    ids = batch[id_col].to_pylist()
    out_band, out_hash, out_id = [], [], []
    for sig, did in zip(sigs, ids):
        r = len(sig) // bands
        for b in range(bands):
            chunk = sig[b * r : (b + 1) * r]
            h = int.from_bytes(
                hashlib.md5(np.asarray(chunk, dtype=np.int64).tobytes()).digest()[:8],
                "big", signed=False) >> 1
            out_band.append(b)
            out_hash.append(h)
            out_id.append(did)
    return pa.table({
        "band_id": pa.array(out_band, type=pa.int32()),
        "band_hash": pa.array(out_hash, type=pa.int64()),
        id_col: pa.array(out_id),
    })


def candidate_pairs_from_bucket(group: pa.Table, id_col: str = "doc_id") -> pa.Table:
    ids = sorted(group[id_col].to_pylist())
    a, b = [], []
    # buckets are tiny under uniform hashing; cap degenerate buckets so one
    # pathological bucket cannot emit O(n^2) pairs (documented truncation)
    cap = 200
    ids = ids[:cap]
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            a.append(ids[i])
            b.append(ids[j])
    return pa.table({"id_a": pa.array(a, type=pa.int64()),
                     "id_b": pa.array(b, type=pa.int64())})


def exact_jaccard(text_a: str, text_b: str, k: int = 3) -> float:
    sa, sb = shingle_hashes(text_a, k), shingle_hashes(text_b, k)
    if sa.size == 0 and sb.size == 0:
        return 1.0
    inter = np.intersect1d(sa, sb, assume_unique=True).size
    union = sa.size + sb.size - inter
    return inter / union if union else 0.0


def minhash_dedup_pairs(
    ds,
    col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 64,
    bands: int = 16,
    k: int = 3,
    threshold: float = 0.7,
    concurrency: int = 4,
) -> pa.Table:
    """Full near-dup pipeline -> verified pa.Table(id_a, id_b, jaccard).

    shingle/minhash: actor-pool map_batches; banding: stateless explode;
    bucket grouping: groupby on (band_id, band_hash) — uniform hash keys;
    verification: semi-join of candidate ids via broadcast set (no shuffle
    join), exact Jaccard on the pair texts.
    """
    sigged = ds.map_batches(
        MinHashStage, fn_constructor_kwargs={"col": col, "num_perm": num_perm, "k": k},
        batch_format="pyarrow", concurrency=concurrency,
    )
    pairs_ds = (
        sigged.map_batches(lambda b: explode_bands(b, bands, id_col), batch_format="pyarrow")
        .groupby(["band_id", "band_hash"])
        .map_groups(lambda g: candidate_pairs_from_bucket(g, id_col), batch_format="pyarrow")
    )
    pairs = pairs_ds.to_pandas()
    if len(pairs) == 0:
        return pa.table({"id_a": pa.array([], type=pa.int64()),
                         "id_b": pa.array([], type=pa.int64()),
                         "jaccard": pa.array([], type=pa.float64())})
    pairs = pairs.drop_duplicates(subset=["id_a", "id_b"]).reset_index(drop=True)
    # fetch candidate texts with a broadcast-id-set semi-join
    need = set(pairs["id_a"]).union(pairs["id_b"])
    need_ref = ray.put(need)

    def pick(batch: pa.Table) -> pa.Table:
        wanted = ray.get(need_ref)
        mask = pa.array([v in wanted for v in batch[id_col].to_pylist()])
        return batch.filter(mask).select([id_col, col])

    texts = {r[id_col]: r[col] for r in ds.map_batches(pick, batch_format="pyarrow").take_all()}
    jac = np.array(
        [exact_jaccard(texts[a] or "", texts[b] or "", k) for a, b in zip(pairs["id_a"], pairs["id_b"])]
    )
    keep = jac >= threshold
    out = pairs[keep]
    return pa.table({
        "id_a": pa.array(out["id_a"].tolist(), type=pa.int64()),
        "id_b": pa.array(out["id_b"].tolist(), type=pa.int64()),
        "jaccard": pa.array(jac[keep].round(6).tolist(), type=pa.float64()),
    })


# -- simhash ---------------------------------------------------------------


def simhash64(text: str) -> int:
    """Weighted 64-bit simhash over unigram token hashes."""
    toks = _tokens(text)
    if not toks:
        return 0
    uniq, counts = np.unique(np.asarray(toks, dtype=object), return_counts=True)
    h = _token_hashes(uniq.tolist())
    bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1).astype(np.int64)
    votes = ((bits * 2 - 1) * counts[:, None]).sum(axis=0)
    return int(((votes > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum())


def simhash_batch(batch: pa.Table, col: str = "text") -> pa.Table:
    vals = [simhash64(t or "") for t in batch[col].to_pylist()]
    return batch.append_column(
        "simhash", pa.array([v - (1 << 63) for v in vals], type=pa.int64())
    )  # shifted into signed range for Arrow


def simhash_near_dup_pairs(ds, col: str = "text", id_col: str = "doc_id",
                           max_hamming: int = 3) -> pa.Table:
    """Banded simhash near-dup: 4 x 16-bit bands; hamming<=3 guarantees at
    least one identical band (pigeonhole). Groupby per band bucket, then
    exact hamming verification on candidates."""
    hashed = ds.map_batches(lambda b: simhash_batch(b, col), batch_format="pyarrow")

    def bands(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_pylist()
        hs = [(v + (1 << 63)) for v in batch["simhash"].to_pylist()]
        ob, obh, oid, ohash = [], [], [], []
        for did, h in zip(ids, hs):
            for b in range(4):
                ob.append(b)
                obh.append((h >> (16 * b)) & 0xFFFF)
                oid.append(did)
                ohash.append(h - (1 << 63))
        return pa.table({"band_id": pa.array(ob, type=pa.int32()),
                         "band_hash": pa.array(obh, type=pa.int64()),
                         id_col: pa.array(oid, type=pa.int64()),
                         "simhash": pa.array(ohash, type=pa.int64())})

    def bucket_pairs(group: pa.Table) -> pa.Table:
        rows = sorted(zip(group[id_col].to_pylist(), group["simhash"].to_pylist()))[:200]
        a, b, d = [], [], []
        for i in range(len(rows)):
            for j in range(i + 1, len(rows)):
                ham = bin((rows[i][1] ^ rows[j][1]) & ((1 << 64) - 1)).count("1")
                if ham <= max_hamming and rows[i][0] != rows[j][0]:
                    a.append(rows[i][0]); b.append(rows[j][0]); d.append(ham)
        return pa.table({"id_a": pa.array(a, type=pa.int64()),
                         "id_b": pa.array(b, type=pa.int64()),
                         "hamming": pa.array(d, type=pa.int64())})

    pairs = (
        hashed.map_batches(bands, batch_format="pyarrow")
        .groupby(["band_id", "band_hash"])
        .map_groups(bucket_pairs, batch_format="pyarrow")
        .to_pandas()
    )
    pairs = pairs.drop_duplicates(subset=["id_a", "id_b"]).sort_values(["id_a", "id_b"])
    return pa.Table.from_pandas(pairs.reset_index(drop=True), preserve_index=False)
