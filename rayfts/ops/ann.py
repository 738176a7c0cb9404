"""Similarity search over an embedding column (``list<float>``).

- ``brute_force_topk``: exact cosine top-k — the baseline. Query matrix is
  broadcast once via ``ray.put``; each batch does one numpy matmul and
  emits its local top-k; the driver merges (k x num_queries rows per
  batch, tiny).
- ``IVFIndex``: the scale path — deterministic k-means (numpy, fixed
  seed, sampled init), assignment as a stateless map_batches (centroid
  matrix broadcast), search probes the ``nprobe`` nearest centroids only.
- ``cosine_near_dup_pairs``: embedding near-duplicate detection via the
  same bucketed structure.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


def _batch_matrix(batch: pa.Table, col: str) -> np.ndarray:
    arr = batch[col].combine_chunks()
    flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    offs = arr.offsets.to_numpy(zero_copy_only=False)
    dim = int(offs[1] - offs[0]) if len(offs) > 1 else 0
    return flat.reshape(-1, dim)


def brute_force_topk(
    ds,
    query_vecs: np.ndarray,
    k: int = 10,
    col: str = "embedding",
    id_col: str = "vec_id",
) -> pa.Table:
    """Exact cosine top-k of each query against the dataset.
    Returns (query_id, rank, vec_id, cosine)."""
    q = _normalize(np.atleast_2d(np.asarray(query_vecs, dtype=np.float64)))
    q_ref = ray.put(q)

    def partial(batch: pa.Table) -> pa.Table:
        qm = ray.get(q_ref)
        m = _normalize(_batch_matrix(batch, col))
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        sims = m @ qm.T  # (n, Q)
        kk = min(k, m.shape[0])
        out_q, out_id, out_s = [], [], []
        for qi in range(qm.shape[0]):
            s = sims[:, qi]
            part = np.argpartition(-s, kk - 1)[:kk] if s.size > kk else np.arange(s.size)
            for i in part:
                out_q.append(qi)
                out_id.append(int(ids[i]))
                out_s.append(float(s[i]))
        return pa.table({
            "query_id": pa.array(out_q, type=pa.int64()),
            id_col: pa.array(out_id, type=pa.int64()),
            "cosine": pa.array(out_s, type=pa.float64()),
        })

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    rows = {"query_id": [], "rank": [], id_col: [], "cosine": []}
    for qi, grp in parts.groupby("query_id"):
        grp = grp.sort_values(["cosine", id_col], ascending=[False, True]).head(k)
        for r, (_, row) in enumerate(grp.iterrows(), 1):
            rows["query_id"].append(int(qi))
            rows["rank"].append(r)
            rows[id_col].append(int(row[id_col]))
            rows["cosine"].append(round(float(row["cosine"]), 6))
    return pa.table({
        "query_id": pa.array(rows["query_id"], type=pa.int64()),
        "rank": pa.array(rows["rank"], type=pa.int64()),
        id_col: pa.array(rows[id_col], type=pa.int64()),
        "cosine": pa.array(rows["cosine"], type=pa.float64()),
    })


def kmeans_fit(sample: np.ndarray, n_clusters: int, iters: int = 10, seed: int = 42) -> np.ndarray:
    """Deterministic numpy k-means on a driver-side sample (centroids are
    the only state shipped to workers)."""
    rng = np.random.default_rng(seed)
    x = _normalize(sample.astype(np.float64))
    init = rng.choice(x.shape[0], size=min(n_clusters, x.shape[0]), replace=False)
    cent = x[np.sort(init)].copy()
    for _ in range(iters):
        assign = (x @ cent.T).argmax(axis=1)
        for c in range(cent.shape[0]):
            m = assign == c
            if m.any():
                cent[c] = x[m].mean(axis=0)
        cent = _normalize(cent)
    return cent


class IVFIndex:
    """IVF over cosine similarity: docs partitioned by nearest centroid.

    build(): one sampling pass (driver) + one stateless assignment pass;
    vectors materialize grouped by cluster (at 100 TB: write one parquet
    dir per cluster instead of holding in memory — the structure is the
    same; here clusters live in the object store).
    search(): score only the ``nprobe`` nearest clusters.
    """

    def __init__(self, n_clusters: int = 16, nprobe: int = 4, seed: int = 42):
        self.n_clusters = n_clusters
        self.nprobe = nprobe
        self.seed = seed
        self.centroids: np.ndarray | None = None
        self._cluster_vecs: dict[int, np.ndarray] = {}
        self._cluster_ids: dict[int, np.ndarray] = {}
        self._col = "embedding"
        self._id_col = "vec_id"
        self.spill_dir: str | None = None

    def build(self, ds, col: str = "embedding", id_col: str = "vec_id",
              sample_rows: int = 2048, spill_dir: str | None = None):
        """``spill_dir=None`` keeps cluster posting tables in driver memory
        (small corpora); with a path, vectors are written as
        cluster-partitioned Parquet (``spill_dir/cluster=N/``) and search
        reads ONLY the probed clusters — the 100 TB layout, where driver
        memory never holds the corpus."""
        self._col, self._id_col = col, id_col
        sample = ds.limit(sample_rows).to_pandas()
        mat = np.stack(sample[col].to_numpy())
        self.centroids = kmeans_fit(mat, self.n_clusters, seed=self.seed)
        cent_ref = ray.put(self.centroids)

        def assign(batch: pa.Table) -> pa.Table:
            cent = ray.get(cent_ref)
            m = _normalize(_batch_matrix(batch, col))
            cl = (m @ cent.T).argmax(axis=1)
            return pa.table({
                "cluster": pa.array(cl.astype(np.int32)),
                id_col: batch[id_col],
                col: batch[col],
            })

        assigned = ds.map_batches(assign, batch_format="pyarrow")
        if spill_dir is not None:
            self.spill_dir = spill_dir
            assigned.write_parquet(spill_dir, partition_cols=["cluster"])
            return self
        df = assigned.to_pandas()
        for cl, grp in df.groupby("cluster"):
            self._cluster_vecs[int(cl)] = _normalize(np.stack(grp[col].to_numpy()).astype(np.float64))
            self._cluster_ids[int(cl)] = grp[id_col].to_numpy()
        return self

    def _load_cluster(self, cl: int) -> tuple[np.ndarray, np.ndarray] | None:
        if cl in self._cluster_vecs:
            return self._cluster_vecs[cl], self._cluster_ids[cl]
        if self.spill_dir is None:
            return None
        import glob as _glob

        import pyarrow.parquet as pq

        files = sorted(_glob.glob(f"{self.spill_dir}/cluster={cl}/*.parquet"))
        if not files:
            return None
        t = pa.concat_tables([pq.read_table(f) for f in files])
        vecs = _normalize(_batch_matrix(t, self._col))
        ids = t[self._id_col].to_numpy(zero_copy_only=False)
        self._cluster_vecs[cl] = vecs  # probe cache
        self._cluster_ids[cl] = ids
        return vecs, ids

    def search(self, query_vec: np.ndarray, k: int = 10) -> list[tuple[int, float]]:
        q = _normalize(np.atleast_2d(np.asarray(query_vec, dtype=np.float64)))[0]
        order = np.argsort(-(self.centroids @ q))[: self.nprobe]
        cands: list[tuple[float, int]] = []
        for cl in order:
            loaded = self._load_cluster(int(cl))
            if loaded is None:
                continue
            vecs, ids = loaded
            sims = vecs @ q
            for i, s in zip(ids, sims):
                cands.append((float(s), int(i)))
        cands.sort(key=lambda t: (-t[0], t[1]))
        return [(i, s) for s, i in cands[:k]]


def cosine_near_dup_pairs(ds, threshold: float = 0.95, col: str = "embedding",
                          id_col: str = "vec_id", n_clusters: int = 16) -> pa.Table:
    """Embedding near-dup: cluster (IVF buckets), then exact pairwise cosine
    inside each cluster — candidate generation never goes quadratic in the
    corpus, only within buckets."""
    ivf = IVFIndex(n_clusters=n_clusters, nprobe=1).build(ds, col=col, id_col=id_col)
    a_out, b_out, s_out = [], [], []
    for cl, vecs in ivf._cluster_vecs.items():
        ids = ivf._cluster_ids[cl]
        sims = vecs @ vecs.T
        iu = np.triu_indices(len(ids), k=1)
        hit = sims[iu] >= threshold
        for i, j, s in zip(iu[0][hit], iu[1][hit], sims[iu][hit]):
            a, b = int(ids[i]), int(ids[j])
            if a > b:
                a, b = b, a
            a_out.append(a); b_out.append(b); s_out.append(round(float(s), 6))
    order = np.lexsort((b_out, a_out)) if a_out else []
    return pa.table({
        "id_a": pa.array([a_out[i] for i in order], type=pa.int64()),
        "id_b": pa.array([b_out[i] for i in order], type=pa.int64()),
        "cosine": pa.array([s_out[i] for i in order], type=pa.float64()),
    })
