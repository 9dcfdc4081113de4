"""Similarity search over embedding columns (list<float>).

- ``cosine_range_search`` / ``cosine_topk`` — brute-force baseline: the
  (small) query matrix is broadcast via ``ray.put`` once, every batch does
  one numpy matmul; top-k keeps per-batch partials and merges in a final
  tiny stage (never materializes the full score matrix).
- ``ivf_topk`` — the scale path: k-means-lite coarse quantizer (trained
  on a sample, broadcast), batches route vectors to their nearest
  centroid bucket; queries probe ``nprobe`` buckets so only a fraction of
  the corpus is scored (IVF-Flat à la FAISS, public literature).
- ``embedding_neardup_pairs`` — exact all-pairs cosine near-dup over the
  corpus itself (dedup family); ``embedding_neardup_lsh`` — the
  high-threshold scale path via sign-random-projection signatures.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

__all__ = [
    "cosine_range_search",
    "cosine_topk",
    "train_centroids",
    "kmeans_lloyd",
    "semantic_dedup",
    "ivf_topk",
    "build_ivf_index",
    "ivf_search_index",
    "embedding_neardup_pairs",
    "embedding_neardup_lsh",
    "train_pq",
    "pq_encode_codes",
    "pq_topk",
    "build_ivfpq_index",
    "ivfpq_search_index",
    "pca_fit",
    "pca_project",
]


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
        out["rank"] = np.arange(1, len(out) + 1, dtype=np.int64)
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


def kmeans_lloyd(ds, k: int, iters: int = 5, vec_col: str = "embedding",
                 id_col: str = "vec_id"):
    """Distributed Lloyd k-means over an embedding column (cosine/unit-
    sphere variant — vectors and centroids are L2-normalized, assignment
    is max dot product, the spherical-k-means convention that matches
    the IVF quantizer here).

    The iterative-algorithm shape: centroids broadcast once per round
    (``ray.put``), each batch emits ONE (k × d) partial sum + count +
    inertia row, the driver folds the O(k·blocks) partials — the same
    broadcast-pull / small-reduce structure as the PageRank operator.
    Initialization is the k globally-smallest ``hash64(id)`` vectors
    (deterministic AND partition/resume-invariant, like every sampling
    op here).  The input is materialized once so the per-iteration pass
    re-reads blocks from the object store, not from parquet.

    Returns ``(centroids (k×d), sizes (k,), inertia float)`` where
    inertia = Σ (1 − cos(x, nearest centroid)).
    """
    import ray
    import ray.data  # noqa: F401

    from ..hashing import hash64

    def prep(t: pa.Table) -> pa.Table:
        m = _normalize(_stack(t[vec_col]))
        h = hash64(t[id_col])
        return pa.table({
            "__h": pa.array(h),
            vec_col: pa.array(list(np.asarray(m, np.float32))),
        })

    mat = ds.map_batches(prep, batch_format="pyarrow").materialize()

    def bottom_k(t: pa.Table) -> pa.Table:
        h = t["__h"].to_numpy(zero_copy_only=False)
        if len(h) > k:
            idx = np.argpartition(h, k)[:k]
            t = t.take(pa.array(np.sort(idx), pa.int64()))
        return t

    seed_rows = mat.map_batches(bottom_k, batch_format="pyarrow").to_pandas()
    seed_rows = seed_rows.sort_values("__h").head(k)
    cents = np.stack(seed_rows[vec_col].to_numpy()).astype(np.float64)

    def fold_pass(cents: np.ndarray):
        """One broadcast-pull assignment pass: (k×d) partial sums, sizes
        and inertia of assigning every vector to ``cents``."""
        cref = ray.put(cents)

        def partial(t: pa.Table, cref=cref) -> pa.Table:
            c = ray.get(cref) if not isinstance(cref, np.ndarray) else cref
            x = _stack(t[vec_col]).astype(np.float64)
            sim = x @ c.T
            assign = sim.argmax(axis=1)
            kk, d = c.shape
            sums = np.zeros((kk, d))
            np.add.at(sums, assign, x)
            counts = np.bincount(assign, minlength=kk).astype(np.int64)
            inertia = float((1.0 - sim[np.arange(len(x)), assign]).sum())
            return pa.table({
                "cluster": pa.array(np.arange(kk, dtype=np.int64)),
                "vsum": pa.array(list(sums.astype(np.float64))),
                "n": pa.array(counts),
                "inertia": pa.array(
                    np.r_[inertia, np.zeros(kk - 1)], pa.float64()),
            })

        folded = mat.map_batches(partial, batch_format="pyarrow").to_pandas()
        g = folded.groupby("cluster", sort=True)
        sums = np.stack(g["vsum"].apply(lambda s: np.sum(np.stack(s), axis=0)))
        counts = g["n"].sum().to_numpy()
        inertia = float(folded["inertia"].sum())
        return sums, counts, inertia

    for _ in range(iters):
        sums, counts, _ = fold_pass(cents)
        nz = counts > 0
        new = cents.copy()
        new[nz] = sums[nz] / counts[nz, None]
        norms = np.linalg.norm(new, axis=1)
        pos = norms > 0
        new[pos] = new[pos] / norms[pos, None]
        cents = new
    # one FINAL assignment against the returned centroids: sizes/inertia
    # must describe the returned model, not the previous iteration's
    # (and iters=0 is then well-defined rather than a NameError)
    _, counts, inertia = fold_pass(cents)
    return cents, counts, inertia


def semantic_dedup(ds, threshold: float = 0.95, k: int = 16, iters: int = 4,
                   id_col: str = "vec_id", vec_col: str = "embedding"):
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): cluster the embedding space with k-means, then
    search for near-duplicate pairs ONLY within each cluster — the
    pairwise cost drops from O(n²) to O(Σ cluster²) ≈ O(n²/k), and each
    cluster's member matrix is the only thing that must fit one worker.

    Emits ``(dup_id, keep_id, cosine)``: within every within-cluster
    near-dup connected set (cosine ≥ threshold), the smallest id is the
    canonical keeper and every other member appears once as ``dup_id``
    (its strongest cosine to the set's members reported).  Pairs whose
    members land in different clusters are missed — the documented
    SemDeDup recall trade; raise ``k`` for cheaper clusters, lower it
    for recall.  Deterministic: clustering init is hash-seeded
    (``kmeans_lloyd``) and the keeper rule is pure min-id.
    """
    import ray

    cents, _, _ = kmeans_lloyd(ds, k, iters=iters, vec_col=vec_col,
                               id_col=id_col)
    cref = ray.put(cents)

    def assign(t: pa.Table) -> pa.Table:
        from .join import _bcast_get

        m = _normalize(_stack(t[vec_col]))
        cl = (m @ _bcast_get(cref).T).argmax(axis=1).astype(np.int32)
        return pa.table({
            id_col: t[id_col],
            vec_col: pa.array(list(np.asarray(m, np.float32))),
            "__cluster": pa.array(cl),
        })

    def dedup_cluster(g):
        import pandas as pd

        ids = g[id_col].to_numpy()
        order = np.argsort(ids, kind="stable")
        ids = ids[order]
        m = np.stack(g[vec_col].to_numpy()[order]).astype(np.float64)
        sim = m @ m.T
        n = len(ids)
        iu, ju = np.triu_indices(n, k=1)
        hit = sim[iu, ju] >= threshold
        pi, pj = iu[hit], ju[hit]
        if not len(pi):
            return pd.DataFrame({ "dup_id": ids[:0], "keep_id": ids[:0],
                                  "cosine": np.empty(0)})
        # union-find over the near-dup pairs (tiny: pairs ≪ cluster²)
        parent = np.arange(n)

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in zip(pi, pj):
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        roots = np.array([find(x) for x in range(n)])
        dup_mask = roots != np.arange(n)  # ids sorted → root = min id
        best = np.zeros(n)
        np.maximum.at(best, pi, sim[pi, pj])
        np.maximum.at(best, pj, sim[pi, pj])
        d = np.flatnonzero(dup_mask)
        return pd.DataFrame({
            "dup_id": ids[d],
            "keep_id": ids[roots[d]],
            "cosine": best[d],
        })

    return (
        ds.map_batches(assign, batch_format="pyarrow")
        .groupby("__cluster")
        .map_groups(dedup_cluster, batch_format="pandas")
    )


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
        out["rank"] = np.arange(1, len(out) + 1, dtype=np.int64)
        return out

    return partial.groupby("query_id").map_groups(merge, batch_format="pandas")


def embedding_neardup_pairs(ds, threshold, id_col="vec_id", vec_col="embedding"):
    """Exact embedding-cosine near-duplicate pairs (dedup family).

    Gathers the (id, vector) corpus once as Arrow blocks, broadcasts the
    normalized matrix via ``ray.put``, and has every batch do ONE numpy
    matmul against it — each unordered pair (a < b) is emitted exactly
    once, by the batch that contains the smaller id.  Exact (recall 1),
    so it is the DuckDB-oracle-checkable form; compute is O(N²/P) and the
    broadcast is O(N·d), which holds while the id+vector corpus fits in
    the object store (tens of millions of rows at d≤1024).  Beyond that,
    use ``embedding_neardup_lsh``.

    Reference analogue: dedup is an engine requirement, not a reference
    operator; semantics follow the exact-cosine definition.
    """
    import ray

    refs = ds.select_columns([id_col, vec_col]).to_arrow_refs()
    tbl = pa.concat_tables([ray.get(r) for r in refs])
    ids = tbl[id_col].to_numpy(zero_copy_only=False)
    mat = _normalize(_stack(tbl[vec_col]))
    ref = ray.put({"ids": ids, "mat": mat})

    def pairs(batch: pa.Table) -> pa.Table:
        # task pool + per-worker broadcast cache, NOT an actor pool: on
        # this host fresh per-query actors re-pay import/fault cold
        # start; long-lived task workers keep the fetched matrix warm
        # (CLAUDE.md actor-pool trap, same rationale as broadcast_join)
        from .join import _bcast_get

        d = _bcast_get(ref)
        bids = batch[id_col].to_numpy(zero_copy_only=False)
        m = _normalize(_stack(batch[vec_col]))
        s = m @ d["mat"].T
        ri, ci = np.nonzero(s >= threshold)
        keep = bids[ri] < d["ids"][ci]
        ri, ci = ri[keep], ci[keep]
        return pa.table(
            {
                "id_a": pa.array(bids[ri]),
                "id_b": pa.array(d["ids"][ci]),
                "cosine": pa.array(s[ri, ci], pa.float64()),
            }
        )

    return ds.map_batches(pairs, batch_format="pyarrow")


def embedding_neardup_lsh(
    ds,
    threshold,
    id_col="vec_id",
    vec_col="embedding",
    n_bits=64,
    max_hamming=6,
    n_tables=4,
    num_buckets=64,
    seed=42,
):
    """Approximate embedding near-dup for HIGH thresholds (≳0.9) at scale.

    Sign-random-projection (Charikar SimHash for vectors): project each
    vector onto ``n_bits`` fixed random hyperplanes, pack the sign bits
    into a uint64 signature, find signature pairs within ``max_hamming``
    via the generic banded pigeonhole pairing (``hamming_near_pairs``),
    then verify each candidate with the exact cosine.  P[bit differs] =
    angle/pi, so cosine 0.95 → expected hamming ≈ 6.5/64: near-dups
    collide in some 16-bit band with high probability while random pairs
    do not.  No all-pairs matmul and no corpus broadcast — the wide step
    is the same bucketed shuffle as the text near-dup family.
    """
    from .neardup import hamming_near_pairs

    class Sign:
        def __init__(self):
            self.planes = None

        def __call__(self, batch: pa.Table) -> pa.Table:
            m = _normalize(_stack(batch[vec_col]))
            if self.planes is None:
                r = np.random.default_rng(seed)
                self.planes = r.standard_normal((n_bits, m.shape[1]))
            bits = (m @ self.planes.T) > 0  # (n, n_bits)
            sig = np.zeros(len(m), dtype=np.uint64)
            for b in range(n_bits):
                sig |= bits[:, b].astype(np.uint64) << np.uint64(b)
            # normalized vector as fixed-size binary: survives the pandas
            # merge inside bucketed_join (list/tensor columns don't — empty
            # groups re-infer object→string and poison later exchanges)
            m32 = np.ascontiguousarray(m, dtype=np.float32)
            vb = pa.FixedSizeBinaryArray.from_buffers(
                pa.binary(m32.shape[1] * 4), len(m32),
                [None, pa.py_buffer(m32.tobytes())],
            )
            return pa.table(
                {id_col: batch[id_col], "sig": pa.array(sig.astype(np.int64)),
                 "__vb": vb}
            )

    signed = ds.map_batches(
        Sign, batch_format="pyarrow", batch_size=2048, concurrency=(1, 8)
    )
    cand = hamming_near_pairs(
        signed.select_columns([id_col, "sig"]), "sig", id_col,
        max_hamming=max_hamming, n_tables=n_tables, num_buckets=num_buckets,
    )

    # exact-cosine verify: join candidate ids back to vectors (both sides)
    from .join import bucketed_join

    vecs = signed.select_columns([id_col, "__vb"])
    a = bucketed_join(
        cand, vecs.map_batches(
            lambda t: t.rename_columns(["id_a", "vec_a"]), batch_format="pyarrow"),
        key="id_a", num_buckets=min(num_buckets, 32),
    )
    ab = bucketed_join(
        a, vecs.map_batches(
            lambda t: t.rename_columns(["id_b", "vec_b"]), batch_format="pyarrow"),
        key="id_b", num_buckets=min(num_buckets, 32),
    )

    def _unpack(col) -> np.ndarray:
        # straight off the Arrow buffers (the audio_features
        # _flat_and_offsets pattern) — no per-row Python bytes
        arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        if pa.types.is_fixed_size_binary(arr.type):
            w = arr.type.byte_width
            data = np.frombuffer(arr.buffers()[1], dtype=np.uint8)
            flat = data[arr.offset * w:(arr.offset + len(arr)) * w]
        else:  # (large_)binary: equal-width rows are contiguous in order
            odt = np.int64 if pa.types.is_large_binary(arr.type) else np.int32
            offs = np.frombuffer(arr.buffers()[1], dtype=odt)
            data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)
            flat = data[offs[arr.offset]:offs[arr.offset + len(arr)]]
        m = flat.view(np.float32).astype(np.float64)
        return m.reshape(len(arr), -1)

    def verify(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"id_a": t["id_a"], "id_b": t["id_b"],
                 "cosine": pa.array([], pa.float64())}
            )
        ma = _unpack(t["vec_a"])
        mb = _unpack(t["vec_b"])
        cos = (ma * mb).sum(axis=1)
        keep = cos >= threshold
        return pa.table(
            {"id_a": t["id_a"].filter(pa.array(keep)),
             "id_b": t["id_b"].filter(pa.array(keep)),
             "cosine": pa.array(cos[keep], pa.float64())}
        )

    return ab.map_batches(verify, batch_format="pyarrow")


def build_ivf_index(ds, root: str, n_centroids: int = 64, id_col="vec_id",
                    vec_col="embedding", sample: int = 4096, seed: int = 42,
                    train: str = "sample") -> str:
    """Persist an IVF-Flat index: centroids + the corpus partitioned into
    one directory per inverted list (``lists/partition=<list_id>/``).

    The layout IS the optimization: a search that probes ``nprobe`` lists
    reads ONLY those directories — at 100 TB the object store never sees
    the other ``1 - nprobe/n_centroids`` of the corpus (prune-at-the-read,
    vs ``ivf_topk`` which prunes compute but still scans every block).
    Built with ``sinks.write_partitioned``, so a crashed build resumes at
    list granularity.

    ``train="sample"`` fits the quantizer on a driver-side sample (fine
    while a representative sample fits one machine); ``train="lloyd"``
    runs the distributed ``kmeans_lloyd`` over the WHOLE corpus — the
    scale path when the corpus distribution is too wide for a sample.
    """
    import os

    import pyarrow.parquet as pq
    import ray

    from ..sinks import write_partitioned

    if train == "lloyd":
        cents, _, _ = kmeans_lloyd(ds, n_centroids, iters=5,
                                   vec_col=vec_col, id_col=id_col)
    else:
        cents = train_centroids(ds, n_centroids, vec_col, sample, seed=seed)
    os.makedirs(root, exist_ok=True)
    pq.write_table(
        pa.table({"centroid": [[float(x) for x in c] for c in cents]}),
        os.path.join(root, "centroids.parquet"),
    )
    cref = ray.put(cents)

    def assign(t: pa.Table) -> pa.Table:
        from .join import _bcast_get

        m = _normalize(_stack(t[vec_col]))
        lid = (m @ _bcast_get(cref).T).argmax(axis=1).astype(np.int32)
        return pa.table(
            {
                id_col: t[id_col],
                vec_col: t[vec_col],
                "list_id": pa.array(lid),
            }
        )

    write_partitioned(
        ds.map_batches(assign, batch_format="pyarrow"),
        os.path.join(root, "lists"),
        partition_col="list_id",
        num_partitions=len(cents),
    )
    return root


def ivf_search_index(root: str, queries_ids, queries_mat, k: int,
                     nprobe: int = 4, id_col="vec_id", vec_col="embedding"):
    """Top-k search against a ``build_ivf_index`` layout.

    Reads ONLY the union of the queries' probed list directories; each
    batch scores its rows against exactly the queries probing that row's
    list, then a tiny per-query merge ranks the partials.  Approximate
    (recall governed by nprobe/n_centroids, same as ``ivf_topk``).
    """
    import os

    import pyarrow.parquet as pq
    import ray
    import ray.data as rd

    cents = _normalize(
        np.stack(
            pq.read_table(os.path.join(root, "centroids.parquet"))["centroid"]
            .to_numpy(zero_copy_only=False)
        ).astype(np.float64)
    )
    qmat = _normalize(np.asarray(queries_mat, np.float64))
    probes = np.argsort(-(qmat @ cents.T), axis=1)[:, :nprobe]
    needed = sorted({int(b) for row in probes for b in row})
    from ..sinks import partition_files

    # committed files only (the _DONE manifests name them)
    paths = []
    for b in needed:
        paths.extend(partition_files(os.path.join(root, "lists"), b))
    empty = pa.table(
        {"query_id": pa.array([], pa.int64()), id_col: pa.array([], pa.int64()),
         "cosine": pa.array([], pa.float64())}
    )
    if not paths:
        return rd.from_arrow(empty)
    qref = ray.put({"ids": np.asarray(queries_ids), "mat": qmat, "probes": probes})

    def score(t: pa.Table) -> pa.Table:
        from .join import _bcast_get

        q = _bcast_get(qref)
        lids = t["list_id"].to_numpy(zero_copy_only=False)
        ids = t[id_col].to_numpy(zero_copy_only=False)
        m = _normalize(_stack(t[vec_col]))
        out_q, out_i, out_s = [], [], []
        for b in np.unique(lids):
            qidx = np.flatnonzero((q["probes"] == b).any(axis=1))
            if not len(qidx):
                continue
            rows = lids == b
            s = m[rows] @ q["mat"][qidx].T
            kk = min(k, s.shape[0])
            top = np.argpartition(-s, kk - 1, axis=0)[:kk]
            rid = ids[rows]
            for j, qi in enumerate(qidx):
                out_q.append(np.full(kk, q["ids"][qi]))
                out_i.append(rid[top[:, j]])
                out_s.append(s[top[:, j], j])
        if not out_q:
            return empty
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q)),
                id_col: pa.array(np.concatenate(out_i)),
                "cosine": pa.array(np.concatenate(out_s), pa.float64()),
            }
        )

    partial = rd.read_parquet(paths).map_batches(score, batch_format="pyarrow")

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["cosine", id_col], ascending=[False, True], kind="mergesort")
        out = g.head(k).copy()
        out["rank"] = np.arange(1, len(out) + 1, dtype=np.int64)
        return out

    return partial.groupby("query_id").map_groups(merge, batch_format="pandas")


# --------------------------------------------------------- product quantization
def _train_pq_mat(x: np.ndarray, m: int, ksub: int, iters: int,
                  seed: int) -> np.ndarray:
    """k-means each of the ``m`` subspace slices of ``x`` to ``ksub``
    centroids; returns ``(m, ksub, d//m)`` float32 codebooks."""
    rng = np.random.default_rng(seed)
    n, d = x.shape
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    dsub = d // m
    ksub = min(ksub, n)
    books = np.empty((m, ksub, dsub), np.float64)
    for j in range(m):
        sub = x[:, j * dsub:(j + 1) * dsub]
        c = sub[rng.choice(n, ksub, replace=False)].copy()
        for _ in range(iters):
            # argmin ||x - c||² = argmax (x·c − ½||c||²): one (n, ksub)
            # matmul instead of an (n, ksub, dsub) distance tensor
            a = (sub @ c.T - 0.5 * (c ** 2).sum(axis=1)[None, :]).argmax(axis=1)
            cnt = np.bincount(a, minlength=ksub)
            sums = np.zeros((ksub, dsub))
            np.add.at(sums, a, sub)
            nz = cnt > 0
            c[nz] = sums[nz] / cnt[nz, None]
        books[j] = c
    return books.astype(np.float32)


def train_pq(ds, m: int = 8, ksub: int = 256, vec_col: str = "embedding",
             sample: int = 4096, iters: int = 10, seed: int = 42) -> np.ndarray:
    """Product-quantization codebooks (Jégou et al. 2011, "Product
    Quantization for Nearest Neighbor Search" — public paper): split the
    (unit-normalized) vector into ``m`` subspaces and k-means each
    subspace to ``ksub`` centroids on a driver-side sample (the
    codebook is the MODEL — bounded at m·ksub·(d/m) floats regardless
    of corpus size, same training contract as ``train_centroids``).

    Returns ``(m, ksub, d//m)`` float32 codebooks."""
    samp = ds.limit(sample).to_pandas()
    x = _normalize(np.stack(samp[vec_col].to_numpy()).astype(np.float64))
    return _train_pq_mat(x, m, ksub, iters, seed)


def pq_encode_codes(mat: np.ndarray, books: np.ndarray) -> np.ndarray:
    """(n, d) → (n, m) uint8 nearest-subcentroid codes (vectorized per
    subspace: one (n, ksub) distance matrix each)."""
    m, ksub, dsub = books.shape
    n = mat.shape[0]
    codes = np.empty((n, m), np.uint8)
    b = books.astype(np.float64)
    for j in range(m):
        sub = mat[:, j * dsub:(j + 1) * dsub]
        # argmin ||x - c||² = argmax (x·c − ½||c||²)
        scores = sub @ b[j].T - 0.5 * (b[j] ** 2).sum(axis=1)[None, :]
        codes[:, j] = scores.argmax(axis=1).astype(np.uint8)
    return codes


def pq_topk(ds, queries_ids, queries_mat, k, books: np.ndarray,
            refine: int = 4,
            id_col: str = "vec_id", vec_col: str = "embedding"):
    """Approximate cosine top-k via asymmetric-distance PQ: each batch
    encodes its vectors to (n, m) uint8 codes — 32× smaller than
    float32 at d=64/m=8, the memory story that makes 100 TB of
    embeddings searchable — and scores EVERY query against them with
    one (m, ksub) inner-product lookup table per query
    (``score = Σ_j T[j, code_j]``, a pure take+sum, no matmul against
    the corpus).  ``refine`` > 0 re-ranks each query's ``refine·k``
    PQ shortlist with exact cosines (the standard ADC + refinement
    deployment; the shortlist matmul is refine·k·nq dots, not n·nq —
    the batch already holds the float vectors so refinement costs no
    extra I/O).  Same partial-top-k → per-query merge shape as
    ``cosine_topk``; returns (query_id, id, score, rank)."""
    import ray

    qmat = _normalize(np.asarray(queries_mat, np.float64))
    m, ksub, dsub = books.shape
    # per-query subspace lookup tables: T[q, j, code] = q_j · c_{j,code}
    tables = np.einsum(
        "qjd,jkd->qjk",
        qmat.reshape(len(qmat), m, dsub), books.astype(np.float64),
    )
    qref = ray.put({"ids": np.asarray(queries_ids), "tables": tables,
                    "books": books, "qmat": qmat})

    def partial(t: pa.Table) -> pa.Table:
        from .join import _bcast_get

        q = _bcast_get(qref)
        mat = _normalize(_stack(t[vec_col]))
        codes = pq_encode_codes(mat, q["books"])          # (n, m) uint8
        tabs = q["tables"]                                # (nq, m, ksub)
        n = len(codes)
        # gather per subspace: scores[n, nq] = Σ_j tabs[:, j, codes[:, j]]
        s = np.zeros((n, len(tabs)))
        for j in range(tabs.shape[1]):
            s += tabs[:, j, :][:, codes[:, j]].T          # (n, nq)
        ids = t[id_col].to_numpy(zero_copy_only=False)
        nq = s.shape[1]
        kk = min(max(k, k * refine), n) if refine else min(k, n)
        top = np.argpartition(-s, kk - 1, axis=0)[:kk]    # (kk, nq)
        if refine:
            # exact cosines for the shortlist only: (kk, nq) dots
            exact = np.einsum("kqd,qd->kq", mat[top], q["qmat"])
            kk2 = min(k, kk)
            order = np.argpartition(-exact, kk2 - 1, axis=0)[:kk2]
            qi = np.repeat(np.arange(nq), kk2)
            ci = order.T.reshape(-1)
            ri = top[ci, qi]
            sc = exact[ci, qi]
        else:
            qi = np.repeat(np.arange(nq), kk)
            ri = top.T.reshape(-1)
            sc = s[ri, qi]
        return pa.table({
            "query_id": pa.array(np.asarray(q["ids"])[qi]),
            id_col: pa.array(ids[ri]),
            "score": pa.array(sc, pa.float64()),
        })

    part = ds.map_batches(partial, batch_format="pyarrow")

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["score", id_col], ascending=[False, True],
                          kind="mergesort")
        out = g.head(k).copy()
        out["rank"] = np.arange(1, len(out) + 1, dtype=np.int64)
        return out

    return part.groupby("query_id").map_groups(merge, batch_format="pandas")


def _codes_to_mat(col, m: int) -> np.ndarray:
    """(n,) Arrow binary column of m-byte PQ codes → (n, m) uint8 view
    straight off the Arrow buffers (no per-row Python)."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    n = len(arr)
    offs = np.frombuffer(arr.buffers()[1], np.int32)[arr.offset:arr.offset + n + 1]
    if offs[-1] - offs[0] != n * m:
        raise ValueError("ragged code column")
    data = np.frombuffer(arr.buffers()[2], np.uint8)
    return data[offs[0]:offs[-1]].reshape(n, m)


def build_ivfpq_index(ds, root: str, n_centroids: int = 64, m: int = 8,
                      ksub: int = 256, id_col="vec_id", vec_col="embedding",
                      sample: int = 4096, iters: int = 10, seed: int = 42,
                      train: str = "sample") -> str:
    """Persist an IVF-PQ index (FAISS IVFPQ layout, public literature):
    coarse centroids route each vector to an inverted list, and the list
    files store only the id + the m-byte PQ code of the RESIDUAL
    ``x − c_list`` — at m=8 over d=64 float32 that is a 32× smaller
    index than IVF-Flat, the difference between "the codes of 100 TB of
    embeddings fit in the cluster's page cache" and "every probe goes
    to storage".

    Because the residual codebooks are SHARED across lists, the ADC
    lookup table is list-independent: ``q·x ≈ q·c_list + Σ_j T[j,
    code_j]`` with one (m, ksub) table per query for the whole search.

    Layout: ``centroids.parquet`` + ``codebooks.parquet`` (+ meta cols)
    and ``lists/partition=<list_id>/`` via ``write_partitioned`` (crash-
    resumable at list granularity, same contract as ``build_ivf_index``).
    """
    import os

    import pyarrow.parquet as pq
    import ray

    from ..sinks import write_partitioned

    if train == "lloyd":
        cents, _, _ = kmeans_lloyd(ds, n_centroids, iters=5,
                                   vec_col=vec_col, id_col=id_col)
    else:
        cents = train_centroids(ds, n_centroids, vec_col, sample, seed=seed)

    # residual codebooks trained on the sample's residuals
    samp = ds.limit(sample).to_pandas()
    x = _normalize(np.stack(samp[vec_col].to_numpy()).astype(np.float64))
    res = x - cents[(x @ cents.T).argmax(axis=1)]
    books = _train_pq_mat(res, m, ksub, iters, seed)

    os.makedirs(root, exist_ok=True)
    pq.write_table(
        pa.table({"centroid": [[float(v) for v in c] for c in cents]}),
        os.path.join(root, "centroids.parquet"),
    )
    mm, kk, dsub = books.shape
    pq.write_table(
        pa.table({
            "subspace": pa.array(np.repeat(np.arange(mm, dtype=np.int32), kk)),
            "code": pa.array(np.tile(np.arange(kk, dtype=np.int32), mm)),
            "centroid": [[float(v) for v in books[j, q]]
                         for j in range(mm) for q in range(kk)],
        }),
        os.path.join(root, "codebooks.parquet"),
    )
    cref = ray.put({"cents": cents, "books": books})

    def assign_encode(t: pa.Table) -> pa.Table:
        from .join import _bcast_get

        q = _bcast_get(cref)
        xm = _normalize(_stack(t[vec_col]))
        lid = (xm @ q["cents"].T).argmax(axis=1)
        codes = pq_encode_codes(xm - q["cents"][lid], q["books"])
        n = len(codes)
        code_arr = pa.BinaryArray.from_buffers(
            pa.binary(), n,
            [None,
             pa.py_buffer((np.arange(n + 1, dtype=np.int32) * m).tobytes()),
             pa.py_buffer(codes.tobytes())],
        )
        return pa.table({
            id_col: t[id_col],
            "code": code_arr,
            "list_id": pa.array(lid.astype(np.int32)),
        })

    write_partitioned(
        ds.map_batches(assign_encode, batch_format="pyarrow"),
        os.path.join(root, "lists"),
        partition_col="list_id",
        num_partitions=len(cents),
    )
    return root


def ivfpq_search_index(root: str, queries_ids, queries_mat, k: int,
                       nprobe: int = 4, id_col="vec_id"):
    """Top-k ADC search against a ``build_ivfpq_index`` layout: reads
    ONLY the probed lists' code files (never any float vector), scores
    each row as ``q·c_list + Σ_j T[q, j, code_j]`` — gathers and adds,
    no matmul against the corpus.  Returns (query_id, id, score, rank);
    scores are the ADC approximation of the cosine."""
    import os

    import pyarrow.parquet as pq
    import ray
    import ray.data as rd

    cents = _normalize(
        np.stack(
            pq.read_table(os.path.join(root, "centroids.parquet"))["centroid"]
            .to_numpy(zero_copy_only=False)
        ).astype(np.float64)
    )
    cb = pq.read_table(os.path.join(root, "codebooks.parquet"))
    mm = int(cb["subspace"].to_numpy(zero_copy_only=False).max()) + 1
    kk = int(cb["code"].to_numpy(zero_copy_only=False).max()) + 1
    books = np.stack(
        cb["centroid"].to_numpy(zero_copy_only=False)
    ).astype(np.float64).reshape(mm, kk, -1)
    dsub = books.shape[2]

    qmat = _normalize(np.asarray(queries_mat, np.float64))
    cscore = qmat @ cents.T                                 # (nq, nlists)
    probes = np.argsort(-cscore, axis=1)[:, :nprobe]
    tables = np.einsum("qjd,jkd->qjk", qmat.reshape(len(qmat), mm, dsub), books)

    from ..sinks import partition_files

    needed = sorted({int(b) for row in probes for b in row})
    paths = []
    for b in needed:
        # metadata-only row counts: skip empty list files so the read
        # never emits 0-row blocks (they confuse downstream schemas)
        paths.extend(
            p for p in partition_files(os.path.join(root, "lists"), b)
            if pq.ParquetFile(p).metadata.num_rows
        )
    empty = pa.table(
        {"query_id": pa.array([], pa.int64()), id_col: pa.array([], pa.int64()),
         "score": pa.array([], pa.float64())}
    )
    if not paths:
        return rd.from_arrow(empty)
    qref = ray.put({"ids": np.asarray(queries_ids), "tables": tables,
                    "cscore": cscore, "probes": probes})

    def score(t: pa.Table) -> pa.Table:
        from .join import _bcast_get

        q = _bcast_get(qref)
        lids = t["list_id"].to_numpy(zero_copy_only=False)
        ids = t[id_col].to_numpy(zero_copy_only=False)
        codes = _codes_to_mat(t["code"], mm)
        out_q, out_i, out_s = [], [], []
        for b in np.unique(lids):
            qidx = np.flatnonzero((q["probes"] == b).any(axis=1))
            if not len(qidx):
                continue
            rows = np.flatnonzero(lids == b)
            c = codes[rows]
            s = np.broadcast_to(q["cscore"][qidx, b][None, :],
                                (len(rows), len(qidx))).copy()
            for j in range(mm):
                s += q["tables"][qidx][:, j, :][:, c[:, j]].T
            kk2 = min(k, s.shape[0])
            top = np.argpartition(-s, kk2 - 1, axis=0)[:kk2]
            rid = ids[rows]
            for j, qi in enumerate(qidx):
                out_q.append(np.full(kk2, q["ids"][qi]))
                out_i.append(rid[top[:, j]])
                out_s.append(s[top[:, j], j])
        if not out_q:
            return empty
        return pa.table({
            "query_id": pa.array(np.concatenate(out_q)),
            id_col: pa.array(np.concatenate(out_i)),
            "score": pa.array(np.concatenate(out_s), pa.float64()),
        })

    partial = rd.read_parquet(paths).map_batches(score, batch_format="pyarrow")

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["score", id_col], ascending=[False, True],
                          kind="mergesort")
        out = g.head(k).copy()
        out["rank"] = np.arange(1, len(out) + 1, dtype=np.int64)
        return out

    return partial.groupby("query_id").map_groups(merge, batch_format="pandas")


# ------------------------------------------------------------------------ PCA
def pca_fit(ds, n_components: int, vec_col: str = "embedding"):
    """Distributed PCA over an embedding column: ONE streaming pass emits
    per-block moment partials (n, Σx, Σxxᵀ — each one row of d + d²
    floats), the driver folds O(blocks) partials and eigendecomposes the
    d×d covariance.  The corpus never materializes and nothing scales
    with row count except the single map pass — the covariance trick
    that makes PCA a 100 TB-safe reduction (d is the embedding dim,
    64 here; d² floats per block is tiny).

    Components are sign-canonicalized (largest-|entry| coordinate made
    positive) so the result is deterministic up to float fold order.

    Returns ``(mean (d,), components (n_components, d),
    explained_variance_ratio (n_components,))``.
    """
    def partial(t: pa.Table) -> pa.Table:
        x = _stack(t[vec_col])
        return pa.table({
            "n": pa.array([len(x)], pa.int64()),
            "s": pa.array([x.sum(axis=0)]),
            "ss": pa.array([(x.T @ x).reshape(-1)]),
        })

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    n = int(parts["n"].sum())
    if n < 2:
        raise ValueError("PCA needs at least 2 rows")
    s = np.sum(np.stack(parts["s"].to_numpy()), axis=0)
    d = len(s)
    ss = np.sum(np.stack(parts["ss"].to_numpy()), axis=0).reshape(d, d)
    mean = s / n
    cov = (ss - n * np.outer(mean, mean)) / (n - 1)
    evals, evecs = np.linalg.eigh(cov)          # ascending
    order = np.argsort(-evals)[:n_components]
    comps = evecs[:, order].T                   # (n_components, d)
    flip = np.sign(comps[np.arange(len(comps)),
                         np.abs(comps).argmax(axis=1)])
    comps *= flip[:, None]
    ratio = np.maximum(evals[order], 0.0) / max(evals.sum(), 1e-300)
    return mean, comps, ratio


def pca_project(ds, mean: np.ndarray, components: np.ndarray,
                id_col: str = "vec_id", vec_col: str = "embedding",
                out_col: str = "pc"):
    """Project each vector onto the fitted components: one matmul per
    batch against the broadcast (n_components, d) matrix; emits
    (id, list<double> of component scores)."""
    import ray

    ref = ray.put({"mean": np.asarray(mean, np.float64),
                   "comps": np.asarray(components, np.float64)})

    def project(t: pa.Table) -> pa.Table:
        from .join import _bcast_get

        p = _bcast_get(ref)
        x = _stack(t[vec_col]) - p["mean"]
        return pa.table({
            id_col: t[id_col],
            out_col: pa.array(list((x @ p["comps"].T))),
        })

    return ds.map_batches(project, batch_format="pyarrow")
