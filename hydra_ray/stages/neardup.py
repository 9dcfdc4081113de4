"""Near-duplicate detection: MinHash+LSH, SimHash, n-gram Jaccard.

Scale shapes (per the MinHash/LSH literature — Broder '97; Leskovec et
al., "Mining of Massive Datasets" ch.3):

- shingle→minhash is a vectorized per-batch ``map_batches`` (numpy);
- LSH banding explodes each doc into (band_id, band_hash) rows and the
  ONLY wide step is a ``groupby`` over band buckets — candidate pairs
  are generated inside each (small) bucket;
- verification (exact n-gram Jaccard on candidate pairs) is a second
  per-pair stage.

Everything is seeded/deterministic.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

__all__ = [
    "MinHasher",
    "minhash_lsh_candidates",
    "ngram_jaccard",
    "SimHasher",
    "simhash_near_pairs",
]

_MERSENNE = (1 << 61) - 1


_SHINGLE_BASE = np.uint64(1_099_511_628_211)  # FNV prime


def _char_shingles(text: str, k: int) -> np.ndarray:
    """Unique 64-bit k-gram hashes, fully vectorized: polynomial hash over
    a sliding byte-window view (no Python substring materialization).
    Deterministic across processes (not Python ``hash()``)."""
    t = " ".join(text.lower().split())
    data = np.frombuffer(t.encode("utf-8"), dtype=np.uint8)
    if len(data) < k:
        return pd.util.hash_array(np.array([t], dtype=object), categorize=False)
    win = np.lib.stride_tricks.sliding_window_view(data, k).astype(np.uint64)
    h = np.zeros(len(win), dtype=np.uint64)
    for j in range(k):
        h = h * _SHINGLE_BASE + win[:, j]
    # finalize (xorshift-multiply) to spread the low-entropy poly hash
    h ^= h >> np.uint64(33)
    h *= np.uint64(0xFF51AFD7ED558CCD)
    h ^= h >> np.uint64(33)
    return np.unique(h)


class MinHasher:
    """Per-batch minhash signatures (n_perm universal-hash permutations)."""

    def __init__(self, text_col="text", id_col="doc_id", n_perm=64, k=5, seed=42):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, _MERSENNE, n_perm, dtype=np.uint64)
        self.b = rng.integers(0, _MERSENNE, n_perm, dtype=np.uint64)
        self.n_perm = n_perm
        self.k = k
        self.text_col = text_col
        self.id_col = id_col

    def signature(self, text: str) -> np.ndarray:
        sh = _char_shingles(text, self.k).astype(np.uint64)
        # (n_perm, n_shingles) universal hash, min over shingles
        v = (np.outer(self.a, sh) + self.b[:, None]) % np.uint64(_MERSENNE)
        return v.min(axis=1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        """Whole-batch vectorized path: all docs' shingles concatenate into
        one array; per-permutation minima come from ``minimum.reduceat``
        over doc boundaries (no per-doc numpy re-dispatch)."""
        texts = batch[self.text_col].to_pylist()
        shingle_sets = [_char_shingles(t or "", self.k).astype(np.uint64) for t in texts]
        counts = np.array([len(s) for s in shingle_sets], dtype=np.int64)
        flat = (
            np.concatenate(shingle_sets) if shingle_sets else np.empty(0, np.uint64)
        )
        starts = np.zeros(len(counts), dtype=np.int64)
        np.cumsum(counts[:-1], out=starts[1:])
        sigs = np.empty((len(texts), self.n_perm), dtype=np.uint64)
        for j in range(self.n_perm):
            hj = (self.a[j] * flat + self.b[j]) % np.uint64(_MERSENNE)
            sigs[:, j] = np.minimum.reduceat(hj, starts)
        return pa.table(
            {
                self.id_col: batch[self.id_col],
                "signature": pa.array(list(sigs), pa.list_(pa.uint64(), self.n_perm)),
            }
        )


def minhash_lsh_candidates(ds, text_col="text", id_col="doc_id", n_perm=64, bands=16, k=5, seed=42):
    """MinHash+LSH candidate pairs.

    ds → map_batches(MinHasher) → explode to (band, band_hash, id) →
    groupby band bucket → pairs.  Returns a Dataset of
    (id_a, id_b) candidate rows (id_a < id_b, deduplicated).
    """
    rows_per_band = n_perm // bands

    hashed = ds.map_batches(
        MinHasher(text_col, id_col, n_perm, k, seed),
        batch_format="pyarrow",
        batch_size=256,  # small batches → task parallelism for the signature loop
    )

    N_BUCKETS = 32  # coarse hash partitions; pairing is vectorized per partition

    def explode(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False)
        sigs = np.stack(t["signature"].to_numpy(zero_copy_only=False))
        n = len(ids)
        band_ids = np.tile(np.arange(bands, dtype=np.int32), n)
        doc_rep = np.repeat(ids, bands)
        bh = np.empty(n * bands, dtype=np.int64)
        for b in range(bands):
            seg = sigs[:, b * rows_per_band : (b + 1) * rows_per_band]
            acc = np.zeros(n, dtype=np.uint64)
            for j in range(rows_per_band):
                acc = acc * np.uint64(1_000_003) + seg[:, j]
            bh[b::bands] = acc.astype(np.int64)
        return pa.table(
            {
                "bucket": pa.array((bh % N_BUCKETS).astype(np.int32)),
                "band": pa.array(band_ids),
                "band_hash": pa.array(bh),
                id_col: pa.array(doc_rep),
            }
        )

    exploded = hashed.map_batches(explode, batch_format="pyarrow")

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        """All same-(band, band_hash) pairs within one coarse partition —
        a vectorized self-merge; buckets of >20 members (near-identical
        cliques) emit star pairs (min ↔ rest) to avoid O(k²) blowup while
        keeping connected components intact."""
        empty = pd.DataFrame(
            {"id_a": pd.Series([], dtype="int64"), "id_b": pd.Series([], dtype="int64")}
        )
        if len(g) < 2:
            return empty
        sizes = g.groupby(["band", "band_hash"])[id_col].transform("size")
        out = []
        small = g[(sizes > 1) & (sizes <= 20)]
        if len(small):
            m = small.merge(small, on=["band", "band_hash"], suffixes=("_a", "_b"))
            m = m[m[f"{id_col}_a"] < m[f"{id_col}_b"]]
            out.append(
                m[[f"{id_col}_a", f"{id_col}_b"]].rename(
                    columns={f"{id_col}_a": "id_a", f"{id_col}_b": "id_b"}
                )
            )
        big = g[sizes > 20]
        if len(big):
            bmin = big.groupby(["band", "band_hash"])[id_col].transform("min")
            star = big[big[id_col] != bmin]
            out.append(
                pd.DataFrame(
                    {"id_a": bmin[big[id_col] != bmin].to_numpy(),
                     "id_b": star[id_col].to_numpy()}
                )
            )
        if not out:
            return empty
        return pd.concat(out).drop_duplicates()

    cand = exploded.groupby("bucket").map_groups(bucket_pairs, batch_format="pandas")
    # dedupe pairs found in multiple bands (C-side aggregate, not map_groups)
    from ray.data.aggregate import Count

    dd = cand.groupby(["id_a", "id_b"]).aggregate(Count(alias_name="__n"))
    return dd.select_columns(["id_a", "id_b"])


def ngram_jaccard(text_a: str, text_b: str, k: int = 5) -> float:
    """Exact character-k-gram Jaccard similarity (verification kernel)."""
    sa, sb = _char_shingles(text_a or "", k), _char_shingles(text_b or "", k)
    inter = np.intersect1d(sa, sb, assume_unique=True).size
    union = sa.size + sb.size - inter
    return float(inter) / union if union else 1.0


def neardup_clusters(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.8,
    n_perm: int = 64,
    bands: int = 16,
    k: int = 5,
    seed: int = 42,
):
    """Full MinHash-LSH near-dup pipeline: candidates → exact n-gram
    Jaccard verification → connected components → (id, cluster_id).

    Verification broadcasts the id→text map (fine while the *candidate*
    id set is small relative to the corpus — LSH guarantees that at a
    sane band setting; at larger scale swap the broadcast for a keyed
    join on id).  Components run driver-side union-find over verified
    pairs only — the candidate set is provably small, the standard
    hybrid (Leskovec et al., MMDS ch.3).
    """
    import ray

    cands = minhash_lsh_candidates(ds, text_col, id_col, n_perm, bands, k, seed)
    texts_df = ds.select_columns([id_col, text_col]).to_pandas()
    text_ref = ray.put(dict(zip(texts_df[id_col], texts_df[text_col])))

    class Verify:
        def __init__(self):
            self.texts = ray.get(text_ref)

        def __call__(self, g: pd.DataFrame) -> pd.DataFrame:
            if g.empty:
                return g.assign(jaccard=[])
            jac = [
                ngram_jaccard(self.texts.get(a, ""), self.texts.get(b, ""), k)
                for a, b in zip(g["id_a"], g["id_b"])
            ]
            g = g.assign(jaccard=jac)
            return g[g["jaccard"] >= threshold]

    verified = cands.map_batches(Verify, batch_format="pandas", concurrency=2)
    pairs = verified.to_pandas()

    parent: dict = {}

    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for a, b in zip(pairs["id_a"], pairs["id_b"]):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    members = sorted({x for p in zip(pairs["id_a"], pairs["id_b"]) for x in p})
    return pd.DataFrame(
        {"doc_id": members, "cluster_id": [find(m) for m in members]}
    )


class SimHasher:
    """64-bit SimHash over word features (near-dup by Hamming distance)."""

    def __init__(self, text_col="text", id_col="doc_id", seed=42):
        self.text_col = text_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col].to_pylist()
        out = np.empty(len(texts), dtype=np.int64)
        for i, t in enumerate(texts):
            words = np.array((t or "").lower().split(), dtype=object)
            if len(words) == 0:
                out[i] = 0
                continue
            h = pd.util.hash_array(words, categorize=False)
            bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1).astype(np.int32)
            v = np.where(bits.sum(axis=0) * 2 > len(words), 1, 0).astype(np.uint64)
            out[i] = int((v << np.arange(64, dtype=np.uint64)).sum()) - (1 << 63)
        return pa.table({self.id_col: batch[self.id_col], "simhash": pa.array(out)})


def simhash_near_pairs(ds, text_col="text", id_col="doc_id", max_hamming=3, n_tables=4):
    """SimHash near-dup candidates: band the 64-bit hash into n_tables
    16-bit keys (pigeonhole: ≤3 differing bits ⇒ at least one identical
    16-bit band), group by band key, verify Hamming ≤ max_hamming."""
    hashed = ds.map_batches(
        SimHasher(text_col, id_col), batch_format="pyarrow", batch_size=512
    )

    def explode(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False)
        sh = t["simhash"].to_numpy(zero_copy_only=False).astype(np.uint64)
        n = len(ids)
        band = np.tile(np.arange(n_tables, dtype=np.int32), n)
        keys = np.empty(n * n_tables, dtype=np.int64)
        for b in range(n_tables):
            keys[b::n_tables] = ((sh >> np.uint64(16 * b)) & np.uint64(0xFFFF)).astype(np.int64)
        return pa.table(
            {
                "band": pa.array(band),
                "band_key": pa.array(keys),
                id_col: pa.array(np.repeat(ids, n_tables)),
                "simhash": pa.array(np.repeat(sh.astype(np.int64), n_tables)),
            }
        )

    exploded = hashed.map_batches(explode, batch_format="pyarrow")

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(id_col)
        ids = g[id_col].to_numpy()
        hs = g["simhash"].to_numpy().astype(np.uint64)
        if len(ids) < 2:
            return pd.DataFrame({"id_a": [], "id_b": [], "hamming": []})
        ia, ib = np.triu_indices(len(ids), k=1)
        ham = np.array(
            [bin(int(hs[x] ^ hs[y])).count("1") for x, y in zip(ia, ib)], dtype=np.int32
        )
        keep = ham <= max_hamming
        return pd.DataFrame({"id_a": ids[ia][keep], "id_b": ids[ib][keep], "hamming": ham[keep]})

    cand = exploded.groupby(["band", "band_key"]).map_groups(pairs, batch_format="pandas")
    from ray.data.aggregate import Min

    return cand.groupby(["id_a", "id_b"]).aggregate(Min("hamming", alias_name="hamming"))
