"""Similarity search over embedding columns (list<float>).

- ``cosine_range_search`` / ``cosine_topk`` — brute-force baseline: the
  (small) query matrix is broadcast via ``ray.put`` once, every batch does
  one numpy matmul; top-k keeps per-batch partials and merges in a final
  tiny stage (never materializes the full score matrix).
- ``ivf_topk`` — the scale path: k-means-lite coarse quantizer (trained
  on a sample, broadcast), batches route vectors to their nearest
  centroid bucket; queries probe ``nprobe`` buckets so only a fraction of
  the corpus is scored (IVF-Flat à la FAISS, public literature).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

__all__ = ["cosine_range_search", "cosine_topk", "train_centroids", "ivf_topk"]


def _stack(col) -> np.ndarray:
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if isinstance(arr, pa.ListArray) or isinstance(arr, pa.LargeListArray) or isinstance(arr, pa.FixedSizeListArray):
        flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
        n = len(arr)
        return flat.reshape(n, -1)
    return np.stack(col.to_numpy(zero_copy_only=False)).astype(np.float64)


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


class _Scorer:
    """Actor-pool batch scorer holding the broadcast query matrix."""

    def __init__(self, qref, id_col, vec_col):
        import ray

        q = ray.get(qref)
        self.qids = q["ids"]
        self.qmat = _normalize(q["mat"])
        self.id_col = id_col
        self.vec_col = vec_col

    def scores(self, batch: pa.Table) -> tuple[np.ndarray, np.ndarray]:
        m = _normalize(_stack(batch[self.vec_col]))
        return batch[self.id_col].to_numpy(zero_copy_only=False), m @ self.qmat.T


def cosine_range_search(ds, queries_ids, queries_mat, threshold, id_col="vec_id", vec_col="embedding"):
    """All (query_id, id, cosine) pairs with cosine ≥ threshold."""
    import ray

    qref = ray.put({"ids": np.asarray(queries_ids), "mat": np.asarray(queries_mat, np.float64)})

    class Range(_Scorer):
        def __init__(self):
            super().__init__(qref, id_col, vec_col)

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids, s = self.scores(batch)
            ri, qi = np.nonzero(s >= threshold)
            return pa.table(
                {
                    "query_id": pa.array(self.qids[qi]),
                    id_col: pa.array(ids[ri]),
                    "cosine": pa.array(s[ri, qi], pa.float64()),
                }
            )

    return ds.map_batches(Range, batch_format="pyarrow", concurrency=(1, 8))


def cosine_topk(ds, queries_ids, queries_mat, k, id_col="vec_id", vec_col="embedding"):
    """Top-k neighbors per query: per-batch partial top-k → merge stage."""
    import ray

    qref = ray.put({"ids": np.asarray(queries_ids), "mat": np.asarray(queries_mat, np.float64)})

    class Partial(_Scorer):
        def __init__(self):
            super().__init__(qref, id_col, vec_col)

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids, s = self.scores(batch)
            kk = min(k, s.shape[0])
            top = np.argpartition(-s, kk - 1, axis=0)[:kk]  # (kk, nq)
            nq = s.shape[1]
            qi = np.repeat(np.arange(nq), kk)
            ri = top.T.reshape(-1)
            return pa.table(
                {
                    "query_id": pa.array(np.asarray(self.qids)[qi]),
                    id_col: pa.array(ids[ri]),
                    "cosine": pa.array(s[ri, qi], pa.float64()),
                }
            )

    partial = ds.map_batches(Partial, batch_format="pyarrow", concurrency=(1, 8))

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["cosine", id_col], ascending=[False, True], kind="mergesort")
        out = g.head(k).copy()
        out["rank"] = np.arange(1, len(out) + 1, dtype=np.int32)
        return out

    return partial.groupby("query_id").map_groups(merge, batch_format="pandas")


def train_centroids(ds, n_centroids, vec_col="embedding", sample=4096, iters=10, seed=42):
    """k-means-lite on a driver-side sample (the coarse quantizer)."""
    samp = ds.limit(sample).to_pandas()
    m = _normalize(np.stack(samp[vec_col].to_numpy()).astype(np.float64))
    rng = np.random.default_rng(seed)
    cents = m[rng.choice(len(m), size=min(n_centroids, len(m)), replace=False)]
    for _ in range(iters):
        assign = (m @ cents.T).argmax(axis=1)
        for c in range(len(cents)):
            mask = assign == c
            if mask.any():
                v = m[mask].mean(axis=0)
                nv = np.linalg.norm(v)
                if nv > 0:
                    cents[c] = v / nv
    return cents


def ivf_topk(ds, queries_ids, queries_mat, k, centroids, nprobe=4, id_col="vec_id", vec_col="embedding"):
    """IVF-Flat: bucket corpus by nearest centroid; score only the
    ``nprobe`` closest buckets per query.  Approximate (recall < 1)."""
    import ray

    cents = _normalize(np.asarray(centroids, np.float64))
    qmat = _normalize(np.asarray(queries_mat, np.float64))
    probes = np.argsort(-(qmat @ cents.T), axis=1)[:, :nprobe]  # (nq, nprobe)
    cref = ray.put(cents)
    qref = ray.put({"ids": np.asarray(queries_ids), "mat": qmat, "probes": probes})

    class BucketScore:
        def __init__(self):
            self.cents = ray.get(cref)
            q = ray.get(qref)
            self.qids, self.qmat, self.probes = q["ids"], q["mat"], q["probes"]
            # invert: bucket -> query indices probing it
            self.by_bucket: dict[int, np.ndarray] = {}
            for qi, bs in enumerate(self.probes):
                for b in bs:
                    self.by_bucket.setdefault(int(b), []).append(qi)
            self.by_bucket = {b: np.array(v) for b, v in self.by_bucket.items()}

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = batch[id_col].to_numpy(zero_copy_only=False)
            m = _normalize(_stack(batch[vec_col]))
            assign = (m @ self.cents.T).argmax(axis=1)
            out_q, out_i, out_s = [], [], []
            for b in np.unique(assign):
                qidx = self.by_bucket.get(int(b))
                if qidx is None:
                    continue
                rows = assign == b
                s = m[rows] @ self.qmat[qidx].T
                kk = min(k, s.shape[0])
                top = np.argpartition(-s, kk - 1, axis=0)[:kk]
                rid = ids[rows]
                for j, qi in enumerate(qidx):
                    out_q.append(np.full(kk, self.qids[qi]))
                    out_i.append(rid[top[:, j]])
                    out_s.append(s[top[:, j], j])
            if not out_q:
                return pa.table(
                    {"query_id": pa.array([], pa.int64()), id_col: pa.array([], pa.int64()),
                     "cosine": pa.array([], pa.float64())}
                )
            return pa.table(
                {
                    "query_id": pa.array(np.concatenate(out_q)),
                    id_col: pa.array(np.concatenate(out_i)),
                    "cosine": pa.array(np.concatenate(out_s), pa.float64()),
                }
            )

    partial = ds.map_batches(BucketScore, batch_format="pyarrow", concurrency=(1, 8))

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["cosine", id_col], ascending=[False, True], kind="mergesort")
        out = g.head(k).copy()
        out["rank"] = np.arange(1, len(out) + 1, dtype=np.int32)
        return out

    return partial.groupby("query_id").map_groups(merge, batch_format="pandas")
