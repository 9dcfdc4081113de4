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
    "minhash_band_signature",
    "minhash_lsh_candidates",
    "ngram_jaccard",
    "jaccard_range_search",
    "ngram_overlap_probe",
    "SimHasher",
    "simhash_near_pairs",
    "hamming_near_pairs",
]

_MERSENNE = (1 << 61) - 1


_SHINGLE_BASE = np.uint64(1_099_511_628_211)  # FNV prime


def _window_hashes(data: np.ndarray, k: int) -> np.ndarray:
    """64-bit polynomial hash of every k-byte window of ``data`` (k passes
    over the buffer, no Python substring materialization), finalized with
    an xorshift-multiply to spread the low-entropy poly hash.

    Allocation-lean on purpose: every extra full-width temporary costs
    real page-fault time on lazy-memory hosts (CLAUDE.md kernel rule), so
    the loop runs in place with buffered uint8→uint64 casts.
    """
    m = len(data) - k + 1
    h = data[:m].astype(np.uint64)
    for j in range(1, k):
        np.multiply(h, _SHINGLE_BASE, out=h)
        np.add(h, data[j : j + m], out=h, casting="unsafe")
    t = h >> np.uint64(33)
    h ^= t
    np.multiply(h, np.uint64(0xFF51AFD7ED558CCD), out=h)
    np.right_shift(h, np.uint64(33), out=t)
    h ^= t
    return h


def _char_shingles(text: str, k: int) -> np.ndarray:
    """Unique 64-bit k-gram hashes of ONE document (reference/verify
    kernel; the batch signature path uses ``_batch_shingles``)."""
    t = " ".join(text.lower().split())
    data = np.frombuffer(t.encode("utf-8"), dtype=np.uint8)
    if len(data) < k:
        return pd.util.hash_array(np.array([t], dtype=object), categorize=False)
    return np.unique(_window_hashes(data, k))


def _batch_shingles(texts: list, k: int) -> tuple[np.ndarray, np.ndarray]:
    """Shingle hashes for a WHOLE batch in one vectorized pass.

    All documents' normalized utf-8 bytes live contiguously in the Arrow
    string buffer already; the k-gram rolling hash runs ONCE over that
    buffer (k vectorized passes), windows that cross a document boundary
    are dropped by offset arithmetic, and short docs (< k bytes) fall
    back to a whole-string hash — identical semantics to mapping
    ``_char_shingles`` per doc, minus per-doc uniqueness (irrelevant for
    min-over-shingles signatures).  This removes round-1's per-doc Python
    loop (~220 docs/s → memory-bandwidth-bound).

    Returns ``(flat, starts)``: concatenated per-doc hash runs in doc
    order plus each doc's start offset (for ``minimum.reduceat``).
    """
    norm = pd.Series(texts, dtype=object).fillna("").str.lower().str.split().str.join(" ")
    arr = pa.array(norm.to_numpy(dtype=object), pa.string())
    n = len(arr)
    if n == 0:
        return np.empty(0, np.uint64), np.empty(0, np.int64)
    offsets = np.frombuffer(arr.buffers()[1], dtype=np.int32)[: n + 1].astype(np.int64)
    data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)[: offsets[-1]]
    lengths = np.diff(offsets)
    long = lengths >= k
    counts = np.where(long, lengths - k + 1, 1)
    starts = np.zeros(n, dtype=np.int64)
    np.cumsum(counts[:-1], out=starts[1:])
    total = int(counts.sum())
    short = ~long
    if not long.any():
        flat = pd.util.hash_array(norm.to_numpy(dtype=object), categorize=False)
        return flat, starts
    h = _window_hashes(data, k)
    # windows crossing an interior doc boundary are invalid: for boundary
    # b, starts b-1 … b-k+1 span it.  (k-1) tiny scatters beat the gather
    # of per-doc position ranges (allocation-lean, see _window_hashes).
    valid = np.ones(len(h), dtype=bool)
    bnd = offsets[1:-1]
    for j in range(1, k):
        idx = bnd - j
        # clamp: boundaries near the buffer end index past the last window
        # (trailing short/empty docs), and near the start below zero
        valid[idx[(idx >= 0) & (idx < len(valid))]] = False
    flat_long = h[valid]
    if not short.any():
        return flat_long, starts
    flat = np.empty(total, dtype=np.uint64)
    sel = np.ones(total, dtype=bool)
    sel[starts[short]] = False
    flat[sel] = flat_long
    flat[starts[short]] = pd.util.hash_array(
        norm.to_numpy(dtype=object)[short], categorize=False
    )
    return flat, starts


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
        """Whole-batch vectorized path: ONE rolling-hash pass over all
        docs' bytes (``_batch_shingles``); per-permutation minima come
        from ``minimum.reduceat`` over doc boundaries (no per-doc Python
        or numpy re-dispatch anywhere)."""
        texts = batch[self.text_col].to_pylist()
        flat, starts = _batch_shingles(texts, self.k)
        sigs = np.empty((len(texts), self.n_perm), dtype=np.uint64)
        for j in range(self.n_perm):
            hj = (self.a[j] * flat + self.b[j]) % np.uint64(_MERSENNE)
            sigs[:, j] = np.minimum.reduceat(hj, starts) if len(flat) else 0
        sig_col = pa.FixedSizeListArray.from_arrays(
            pa.array(sigs.reshape(-1), pa.uint64()), self.n_perm
        )
        return pa.table({self.id_col: batch[self.id_col], "signature": sig_col})


def minhash_band_signature(texts, k: int = 6, n_bands: int = 4,
                           rows_per_band: int = 2,
                           seed: int = 42) -> np.ndarray:
    """64-bit BANDED minhash signature: 16-bit lane ``b`` is a hash of
    ``rows_per_band`` independent minhashes (band ``b``'s rows), so two
    texts agree on lane ``b`` iff (modulo the 16-bit hash) their
    minhash rows for that band all agree — P(lane match) = J^r per the
    standard banding analysis (Broder; Leskovec et al. MMDS ch.3).

    This packs a minhash LSH scheme into the streaming near-dup tier's
    existing 64-bit signature slot (`state/neardup_index.py`): band
    buckets index lanes exactly as for SimHash/audio fingerprints, and
    the match predicate becomes "≥ min_band_matches equal lanes"
    (lane-distance metric) instead of bit-Hamming.  One vectorized
    `_batch_shingles` pass + ``n_bands·rows_per_band`` reduceat minima —
    no per-doc Python."""
    rng = np.random.default_rng(seed)
    m = n_bands * rows_per_band
    a = rng.integers(1, _MERSENNE, m, dtype=np.uint64)
    b = rng.integers(0, _MERSENNE, m, dtype=np.uint64)
    flat, starts = _batch_shingles(list(texts), k)
    n = len(starts)
    if n == 0:
        return np.empty(0, np.uint64)
    mins = np.empty((m, n), dtype=np.uint64)
    for j in range(m):
        hj = (a[j] * flat + b[j]) % np.uint64(_MERSENNE)
        mins[j] = np.minimum.reduceat(hj, starts) if len(flat) else 0
    sig = np.zeros(n, dtype=np.uint64)
    for band in range(n_bands):
        acc = np.zeros(n, dtype=np.uint64)
        for r in range(rows_per_band):
            acc = acc * np.uint64(1_099_511_628_211) ^ mins[
                band * rows_per_band + r]
        acc *= np.uint64(0x9E3779B97F4A7C15)
        acc ^= acc >> np.uint64(31)
        sig |= (acc & np.uint64(0xFFFF)) << np.uint64(16 * band)
    return sig


def minhash_signatures(ds, text_col="text", id_col="doc_id", n_perm=64, k=5,
                       seed=42, batch_size=1024):
    """(id, signature) dataset — one MinHasher pass over the corpus."""
    return ds.map_batches(
        MinHasher(text_col, id_col, n_perm, k, seed),
        batch_format="pyarrow",
        batch_size=batch_size,
    )


def minhash_lsh_candidates(
    ds, text_col="text", id_col="doc_id", n_perm=64, bands=16, k=5, seed=42,
    num_buckets=256, hashed=None,
):
    """MinHash+LSH candidate pairs.

    ds → map_batches(MinHasher) → explode to (band, band_hash, id) →
    groupby hash bucket → vectorized same-(band, band_hash) pairing.
    Returns a Dataset of (id_a, id_b) candidate rows (id_a < id_b,
    deduplicated).  Pass ``hashed`` (an (id, signature) dataset from
    ``minhash_signatures``) to reuse signatures computed elsewhere.

    ``num_buckets`` controls the wide step's parallelism: buckets are a
    well-mixed hash of (band, band_hash), so expected bucket size is
    O(n·bands / num_buckets) and the per-bucket pairing merge stays
    C-side.  Scale num_buckets with the corpus (the default 256 keeps
    every CPU of a 32-node pool busy); pairing correctness never depends
    on it because pairs form on the full (band, band_hash) key.
    """
    rows_per_band = n_perm // bands

    if hashed is None:
        hashed = minhash_signatures(ds, text_col, id_col, n_perm, k, seed)

    def explode(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False)
        sig = t["signature"].combine_chunks()
        n = len(ids)
        sigs = sig.flatten().to_numpy(zero_copy_only=False).reshape(n, n_perm)
        band_ids = np.tile(np.arange(bands, dtype=np.int32), n)
        doc_rep = np.repeat(ids, bands)
        bh = np.empty(n * bands, dtype=np.int64)
        for b in range(bands):
            seg = sigs[:, b * rows_per_band : (b + 1) * rows_per_band]
            acc = np.zeros(n, dtype=np.uint64)
            for j in range(rows_per_band):
                acc = acc * np.uint64(1_000_003) + seg[:, j]
            bh[b::bands] = acc.astype(np.int64)
        # mix (band, band_hash) into the bucket id so buckets spread evenly
        mix = bh.astype(np.uint64) ^ (
            (band_ids.astype(np.uint64) + np.uint64(1)) * np.uint64(0x9E3779B97F4A7C15)
        )
        mix ^= mix >> np.uint64(29)
        mix *= np.uint64(0xBF58476D1CE4E5B9)
        mix ^= mix >> np.uint64(32)
        return pa.table(
            {
                "bucket": pa.array((mix % np.uint64(num_buckets)).astype(np.int32)),
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
    # dedupe pairs found in multiple bands — vectorized bucketed distinct
    # (ray.data's sort-aggregate reduces per group in Python: 70 s for
    # 72 k pair-groups at sf0.1, vs ~1 s for this shape)
    from .dedup import bucketed_distinct

    return bucketed_distinct(cand, ["id_a", "id_b"], num_buckets=16)


def ngram_jaccard(text_a: str, text_b: str, k: int = 5) -> float:
    """Exact character-k-gram Jaccard similarity (per-pair reference
    kernel; batches use ``ngram_jaccard_batch``)."""
    sa, sb = _char_shingles(text_a or "", k), _char_shingles(text_b or "", k)
    inter = np.intersect1d(sa, sb, assume_unique=True).size
    union = sa.size + sb.size - inter
    return float(inter) / union if union else 1.0


def _unique_per_doc(flat: np.ndarray, starts: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(hash, doc) pairs deduplicated within each doc, sorted by (doc, hash)."""
    n = len(starts)
    counts = np.diff(np.append(starts, len(flat)))
    doc = np.repeat(np.arange(n, dtype=np.int64), counts)
    order = np.lexsort((flat, doc))
    d, h = doc[order], flat[order]
    keep = np.ones(len(h), dtype=bool)
    keep[1:] = (d[1:] != d[:-1]) | (h[1:] != h[:-1])
    return h[keep], d[keep]


def ngram_jaccard_batch(texts_a, texts_b, k: int = 5) -> np.ndarray:
    """Exact k-gram Jaccard for N pairs, fully vectorized AND text-deduped.

    Candidate batches repeat hot documents heavily, so the expensive work
    (normalize + rolling-hash + per-doc unique) runs once per DISTINCT
    text; per-pair intersection counts come from one gather + lexsort
    over the distinct-pair shingle runs.  Semantics identical to mapping
    ``ngram_jaccard`` over the pairs.
    """
    n = len(texts_a)
    if n == 0:
        return np.empty(0, np.float64)
    all_texts = np.asarray(
        ["" if t is None else t for t in list(texts_a) + list(texts_b)], dtype=object
    )
    # np.unique, NOT pd.factorize: pandas' object hashtable compares
    # C-string-style, so '' and '\x00' (any NUL-containing text) collapse
    # into one code and distinct docs share shingle sets.
    uniques, codes = np.unique(all_texts, return_inverse=True)
    ca, cb = codes[:n].astype(np.int64), codes[n:].astype(np.int64)
    U = len(uniques)
    # distinct (code_a, code_b) pairs — duplicate pairs share one result
    pk = ca * U + cb
    upk, inv = np.unique(pk, return_inverse=True)
    uca, ucb = upk // U, upk % U
    flat, starts = _batch_shingles(list(uniques), k)
    h, d = _unique_per_doc(flat, starts)
    counts = np.bincount(d, minlength=U)
    doc_starts = np.cumsum(counts) - counts

    def gather(doc_codes: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        c = counts[doc_codes]
        run_starts = np.cumsum(c) - c
        pos = (
            np.arange(int(c.sum()), dtype=np.int64)
            - np.repeat(run_starts, c)
            + np.repeat(doc_starts[doc_codes], c)
        )
        pair_idx = np.repeat(np.arange(len(doc_codes), dtype=np.int64), c)
        return h[pos], pair_idx

    ga, pa_idx = gather(uca)
    gb, pb_idx = gather(ucb)
    dd = np.concatenate([pa_idx, pb_idx])
    hh = np.concatenate([ga, gb])
    order = np.lexsort((hh, dd))
    ds_, hs_ = dd[order], hh[order]
    dup = (ds_[1:] == ds_[:-1]) & (hs_[1:] == hs_[:-1])
    m = len(upk)
    inter = np.bincount(ds_[1:][dup], minlength=m)
    union = counts[uca] + counts[ucb] - inter
    jac_u = np.where(union > 0, inter / np.maximum(union, 1), 1.0)
    return jac_u[inv]


def jaccard_range_search(
    ds,
    probe_ids,
    probe_texts,
    threshold: float,
    k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Exact k-gram Jaccard of every document against a SMALL broadcast
    probe set — the ``ann_range`` pattern applied to text: the probes go
    into the object store once (``ray.put``), every batch scores B×P
    pairs through the text-deduped vectorized kernel, and nothing
    shuffles (linear in corpus size, embarrassingly parallel).  This is
    the exact/oracle-checkable member of the near-dup family (LSH
    candidates are probabilistic and not SQL-expressible).

    Emits ``(probe_id, doc_id, jaccard)`` for pairs ≥ ``threshold``.
    Both sides of the driver oracle compute the same integer
    intersection/union ratio, so any threshold is hash-stable (the only
    divergence channel is a 64-bit shingle-hash collision).  Note: docs
    shorter than ``k`` normalized chars use a whole-string fallback
    shingle in this kernel but produce zero shingles in the SQL oracle —
    keep oracle fixtures ≥ ``k`` chars (the synthetic corpus is ≥48).
    """
    import ray

    # probe shingle sets are fixed: hash+unique them ONCE on the driver
    # and broadcast the sorted arrays (not the texts)
    psets = [_char_shingles(t or "", k) for t in probe_texts]
    probes_ref = ray.put(
        (np.asarray(list(probe_ids), dtype=np.int64), psets)
    )

    def score(batch: pa.Table) -> pa.Table:
        pids, psh = ray.get(probes_ref)
        texts = batch[text_col].to_pylist()
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        B, P = len(texts), len(pids)
        empty = pa.table(
            {
                "probe_id": pa.array([], pa.int64()),
                "doc_id": pa.array([], pa.int64()),
                "jaccard": pa.array([], pa.float64()),
            }
        )
        if B == 0 or P == 0:
            return empty
        # one rolling-hash pass over the batch, deduped per doc; then per
        # probe ONE searchsorted membership pass + reduceat — no per-pair
        # shingle-run expansion (B×P pairs cost P passes over B docs)
        flat, starts = _batch_shingles(texts, k)
        h, d = _unique_per_doc(flat, starts)
        doc_c = np.bincount(d, minlength=B).astype(np.int64)
        run_starts = np.cumsum(doc_c) - doc_c
        nz = doc_c > 0  # reduceat only over non-empty runs: a clamped
        # empty-run index would truncate the PRECEDING doc's sum
        out_p, out_d, out_j = [], [], []
        for j in range(P):
            ps = psh[j]
            inter = np.zeros(B, np.int64)
            if len(h) and len(ps) and nz.any():
                idx = np.searchsorted(ps, h)
                idx_c = np.minimum(idx, len(ps) - 1)
                member = (idx < len(ps)) & (ps[idx_c] == h)
                inter[nz] = np.add.reduceat(member, run_starts[nz])
            union = len(ps) + doc_c - inter
            jac = np.where(union > 0, inter / np.maximum(union, 1), 1.0)
            keep = jac >= threshold
            out_p.append(np.full(int(keep.sum()), pids[j], np.int64))
            out_d.append(ids[keep])
            out_j.append(jac[keep])
        return pa.table(
            {
                "probe_id": pa.array(np.concatenate(out_p), pa.int64()),
                "doc_id": pa.array(np.concatenate(out_d), pa.int64()),
                "jaccard": pa.array(np.concatenate(out_j), pa.float64()),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow")


def _word_ngram_doc_hashes(texts, n: int) -> tuple[np.ndarray, np.ndarray]:
    """Per-doc DISTINCT word n-gram hashes: one Arrow split over the
    normalized batch, n shifted views string-concatenated (windows that
    cross a doc boundary masked), one hash pass, (doc, hash) dedupe.
    Gram identity is the hash of the literal space-joined token string,
    so a SQL ``array_to_string(ws[i:i+n-1], ' ')`` sees the same grams.

    Returns ``(hashes, doc_idx)`` sorted by (doc, hash), deduped per doc.
    """
    import pyarrow.compute as pc

    norm = pd.Series(texts, dtype=object).fillna("").str.lower().str.split().str.join(" ")
    toks = pc.split_pattern(pa.array(norm.to_numpy(dtype=object), pa.string()), " ")
    flat = toks.values.to_numpy(zero_copy_only=False)
    offsets = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    m = len(flat) - n + 1
    if m <= 0:
        return np.empty(0, np.uint64), np.empty(0, np.int64)
    valid = np.ones(m, dtype=bool)
    bnd = offsets[1:-1]
    for j in range(1, n):
        idx = bnd - j
        valid[idx[(idx >= 0) & (idx < m)]] = False
    # empty docs split to [''] — a 1-token doc yields no n-gram for n>1,
    # but its lone window could survive the boundary mask only if n == 1
    if not valid.any():
        return np.empty(0, np.uint64), np.empty(0, np.int64)
    parts = [pd.Series(flat[j:j + m], dtype=object)[valid] for j in range(n)]
    grams = parts[0].str.cat(parts[1:], sep=" ").to_numpy(dtype=object)
    h = pd.util.hash_array(grams, categorize=False)
    starts = np.flatnonzero(valid)
    doc = np.searchsorted(offsets[1:], starts, side="right")
    order = np.lexsort((h, doc))
    d, hh = doc[order], h[order]
    keep = np.ones(len(hh), dtype=bool)
    keep[1:] = (d[1:] != d[:-1]) | (hh[1:] != hh[:-1])
    return hh[keep], d[keep]


def ngram_overlap_probe(
    ds,
    probe_ids,
    probe_texts,
    min_overlap: int,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Benchmark decontamination: flag every document sharing at least
    ``min_overlap`` DISTINCT word ``n``-grams with any probe (eval-set)
    document — the published n-gram-collision decontamination rule
    (Brown et al. 2020 §C applied it with 13-grams; n is a knob).

    Same broadcast shape as ``jaccard_range_search``: probe gram sets go
    to the object store once, every batch runs one membership pass per
    probe — linear in corpus size, no shuffle.  Emits ``(probe_id,
    doc_id, n_overlap)`` for flagged pairs; anti-filter the flagged
    doc_ids to decontaminate.  Integer overlap counts, so the SQL oracle
    matches bit-for-bit (hash collisions are the only divergence channel).
    """
    import ray

    psets = []
    for t in probe_texts:
        h, _ = _word_ngram_doc_hashes([t], n)
        psets.append(h)
    probes_ref = ray.put((np.asarray(list(probe_ids), dtype=np.int64), psets))

    def score(batch: pa.Table) -> pa.Table:
        pids, psh = ray.get(probes_ref)
        texts = batch[text_col].to_pylist()
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        B, P = len(texts), len(pids)
        empty = pa.table(
            {
                "probe_id": pa.array([], pa.int64()),
                "doc_id": pa.array([], pa.int64()),
                "n_overlap": pa.array([], pa.int64()),
            }
        )
        if B == 0 or P == 0:
            return empty
        h, d = _word_ngram_doc_hashes(texts, n)
        if not len(h):
            return empty
        doc_c = np.bincount(d, minlength=B).astype(np.int64)
        run_starts = np.cumsum(doc_c) - doc_c
        nz = doc_c > 0  # reduceat only over non-empty runs: a clamped
        # empty-run index would truncate the PRECEDING doc's sum
        out_p, out_d, out_n = [], [], []
        for j in range(P):
            ps = psh[j]
            inter = np.zeros(B, np.int64)
            if len(ps) and nz.any():
                idx = np.searchsorted(ps, h)
                idx_c = np.minimum(idx, len(ps) - 1)
                member = (idx < len(ps)) & (ps[idx_c] == h)
                inter[nz] = np.add.reduceat(member, run_starts[nz])
            keep = inter >= min_overlap
            out_p.append(np.full(int(keep.sum()), pids[j], np.int64))
            out_d.append(ids[keep])
            out_n.append(inter[keep])
        return pa.table(
            {
                "probe_id": pa.array(np.concatenate(out_p), pa.int64()),
                "doc_id": pa.array(np.concatenate(out_d), pa.int64()),
                "n_overlap": pa.array(np.concatenate(out_n), pa.int64()),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow")


def neardup_clusters(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.8,
    n_perm: int = 64,
    bands: int = 16,
    k: int = 5,
    seed: int = 42,
    num_buckets: int = 64,
    resolve: str = "driver",
):
    """Full MinHash-LSH near-dup pipeline: candidates → signature-estimate
    prefilter → exact n-gram Jaccard verification → connected components →
    (id, cluster_id).

    Shape (two shuffles past the candidate set, both bucketed):

    1. ATTACH — candidate pairs explode to (lookup=id, pair, role) rows,
       union with text rows (from the documents table) and signature rows
       (from the one materialized (id, signature) table, shared with the
       banding step), and one ``groupby(bucket(lookup))`` merge attaches
       each doc's text + signature to every pair-role row.  Texts never
       touch the driver; signatures are computed exactly once.
    2. VERIFY — regroup by ``bucket(pair)``; the two role rows of each
       pair meet, the minhash signatures give an unbiased Jaccard
       estimate (matching fraction of ``n_perm`` components), and ONLY
       pairs with estimate ≥ threshold − max(0.3, 2/√n_perm) reach the
       exact kernel.  At n_perm=64 a true pair at the threshold fails the
       prefilter with P < 1e-8 (binomial tail), while the typical ~100:1
       LSH false-positive bulk is dropped before the expensive exact
       shingle intersection.  Standard hybrid per Leskovec et al., MMDS
       ch.3 (candidate recall is governed by the banding either way).

    Components: ``resolve="driver"`` runs union-find over VERIFIED pairs
    on the driver (fine while the verified-pair set fits one node);
    ``resolve="distributed"`` runs the alternating-star connected
    components (`stages/graph.py`) — O(log n) bucket-shuffle rounds, no
    driver collect — the 10^12-doc path.  Both label clusters by min
    member id, so the outputs are identical.
    """
    from ..hashing import hash64

    est_cut = max(0.0, threshold - max(0.3, 2.0 / np.sqrt(n_perm)))
    sig_bytes = n_perm * 8

    # ONE MinHasher pass: the (id, signature) table is ~8·n_perm B/doc
    # (≈5 % of a text corpus) — materializing it is the cheap trade
    # against re-shingling the whole corpus for the attach step below.
    sigged = minhash_signatures(ds, text_col, id_col, n_perm, k, seed).materialize()

    # materialize the (small) candidate set: chaining every wide op in one
    # lazy graph measurably de-pipelines on ray 2.49; the intermediate is
    # O(candidate pairs) and object-store-resident
    cands = minhash_lsh_candidates(
        ds, text_col, id_col, n_perm, bands, k, seed, hashed=sigged
    ).materialize()

    union_schema = pa.schema(
        [
            ("lookup", pa.int64()),
            ("id_a", pa.int64()),
            ("id_b", pa.int64()),
            ("role", pa.int8()),
            ("text", pa.string()),
            ("sig", pa.binary()),
        ]
    )

    def pair_rows(t: pa.Table) -> pa.Table:
        ia = t["id_a"].to_numpy(zero_copy_only=False)
        ib = t["id_b"].to_numpy(zero_copy_only=False)
        n = len(ia)
        return pa.table(
            {
                "lookup": pa.array(np.concatenate([ia, ib])),
                "id_a": pa.array(np.concatenate([ia, ia])),
                "id_b": pa.array(np.concatenate([ib, ib])),
                "role": pa.array(
                    np.repeat(np.array([0, 1], np.int8), n), pa.int8()
                ),
                "text": pa.nulls(2 * n, pa.string()),
                "sig": pa.nulls(2 * n, pa.binary()),
            },
            schema=union_schema,
        )

    def text_rows(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table(
            {
                "lookup": t[id_col].cast(pa.int64()),
                "id_a": pa.nulls(n, pa.int64()),
                "id_b": pa.nulls(n, pa.int64()),
                "role": pa.array(np.full(n, -1, np.int8), pa.int8()),
                "text": t[text_col].cast(pa.string()),
                "sig": pa.nulls(n, pa.binary()),
            },
            schema=union_schema,
        )

    def sig_rows(t: pa.Table) -> pa.Table:
        n = t.num_rows
        sigs = (
            t["signature"].combine_chunks().flatten().to_numpy().reshape(n, n_perm)
        )
        buf = np.ascontiguousarray(sigs.astype("<u8")).tobytes()
        sig_col = pa.Array.from_buffers(
            pa.binary(),
            n,
            [
                None,
                pa.py_buffer(
                    np.arange(0, (n + 1) * sig_bytes, sig_bytes, dtype=np.int32).tobytes()
                ),
                pa.py_buffer(buf),
            ],
        )
        return pa.table(
            {
                "lookup": t[id_col].cast(pa.int64()),
                "id_a": pa.nulls(n, pa.int64()),
                "id_b": pa.nulls(n, pa.int64()),
                "role": pa.array(np.full(n, -2, np.int8), pa.int8()),
                "text": pa.nulls(n, pa.string()),
                "sig": sig_col,
            },
            schema=union_schema,
        )

    def bucket_of(t: pa.Table) -> pa.Table:
        b = (hash64(t["lookup"]) % np.uint64(num_buckets)).astype(np.int32)
        return t.append_column("__bucket", pa.array(b))

    both = (
        cands.map_batches(pair_rows, batch_format="pyarrow")
        .union(ds.map_batches(text_rows, batch_format="pyarrow", batch_size=1024))
        .union(sigged.map_batches(sig_rows, batch_format="pyarrow", batch_size=1024))
        .map_batches(bucket_of, batch_format="pyarrow")
    )

    attached_schema = pa.schema(
        [
            ("id_a", pa.int64()),
            ("id_b", pa.int64()),
            ("role", pa.int8()),
            ("text", pa.string()),
            ("sig", pa.binary()),
        ]
    )

    def attach(g: pd.DataFrame) -> pa.Table:
        pr = g[g["role"] >= 0]
        tx = g.loc[g["role"] == -1, ["lookup", "text"]]
        sg = g.loc[g["role"] == -2, ["lookup", "sig"]]
        out = (
            pr[["lookup", "id_a", "id_b", "role"]]
            .merge(tx, on="lookup", how="inner")
            .merge(sg, on="lookup", how="inner")
        )[["id_a", "id_b", "role", "text", "sig"]]
        return pa.Table.from_pandas(out, schema=attached_schema, preserve_index=False)

    def rebucket(t: pa.Table) -> pa.Table:
        h = hash64(t["id_a"]) ^ (hash64(t["id_b"]) * np.uint64(0x9E3779B97F4A7C15))
        return t.append_column(
            "__pb", pa.array((h % np.uint64(num_buckets)).astype(np.int32))
        )

    attached = (
        both.groupby("__bucket")
        .map_groups(attach, batch_format="pandas")
        .map_batches(rebucket, batch_format="pyarrow")
    )

    def verify(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {"id_a": pd.Series([], dtype="int64"),
             "id_b": pd.Series([], dtype="int64"),
             "jaccard": pd.Series([], dtype="float64")}
        )
        if g.empty:
            return empty
        g = g.sort_values(["id_a", "id_b", "role"], kind="stable")
        a = g[g["role"] == 0].reset_index(drop=True)
        b = g[g["role"] == 1].reset_index(drop=True)
        if len(a) != len(b):  # a pair missing one side's doc row
            keys_a = pd.MultiIndex.from_frame(a[["id_a", "id_b"]])
            keys_b = pd.MultiIndex.from_frame(b[["id_a", "id_b"]])
            common = keys_a.intersection(keys_b)
            a = a.set_index(["id_a", "id_b"]).loc[common].reset_index()
            b = b.set_index(["id_a", "id_b"]).loc[common].reset_index()
        if not len(a):
            return empty
        sa = np.frombuffer(b"".join(a["sig"]), "<u8").reshape(len(a), n_perm)
        sb = np.frombuffer(b"".join(b["sig"]), "<u8").reshape(len(b), n_perm)
        est = (sa == sb).mean(axis=1)
        keep = est >= est_cut
        if not keep.any():
            return empty
        a, b = a.loc[keep], b.loc[keep]
        jac = ngram_jaccard_batch(a["text"].tolist(), b["text"].tolist(), k)
        out = pd.DataFrame(
            {"id_a": a["id_a"].to_numpy(), "id_b": a["id_b"].to_numpy(), "jaccard": jac}
        )
        return out.loc[out["jaccard"] >= threshold]

    verified = attached.groupby("__pb").map_groups(verify, batch_format="pandas")

    if resolve == "distributed":
        from .graph import connected_components

        out = connected_components(
            verified, "id_a", "id_b", num_buckets=num_buckets
        ).to_pandas()
        if out.empty:
            return pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                                 "cluster_id": pd.Series([], dtype="int64")})
        return (
            out.rename(columns={"node": "doc_id", "component": "cluster_id"})
            .sort_values("doc_id").reset_index(drop=True)
        )

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


# byte value → its 8 bits (LSB first), int16 so reduceat sums don't wrap
_BYTE_BITS = ((np.arange(256)[:, None] >> np.arange(8)[None, :]) & 1).astype(np.int16)


class SimHasher:
    """64-bit SimHash over word features (near-dup by Hamming distance).

    Whole-batch vectorized: all docs' words explode into one flat array,
    hash once, per-bit majority votes come from ``add.reduceat`` over doc
    boundaries — no per-doc Python loop.  The word×64 bit matrix is the
    memory hot spot: it is materialized int16 (not int64) through a
    byte→bits lookup, in doc-aligned chunks, into a small reused scratch
    buffer — on this host first-touch page faults on a fresh 256 MB int64
    matrix cost ~20 s; the ≤8 MB scratch faults once and its pages stay
    warm in the long-lived Ray worker's allocator across tasks/queries
    (task pool deliberately, NOT an actor pool: fresh actors re-pay the
    cold-start every query; the scratch is lazy so pickling stays tiny)."""

    def __init__(self, text_col="text", id_col="doc_id", seed=42,
                 chunk_words=1 << 16):
        self.text_col = text_col
        self.id_col = id_col
        self._shifts = np.arange(64, dtype=np.uint64)
        self._chunk_words = int(chunk_words)
        self._bits = None  # lazy: not serialized with the callable

    def __getstate__(self):
        d = self.__dict__.copy()
        d["_bits"] = None
        return d

    def _bit_sums(self, h: np.ndarray, counts: np.ndarray) -> np.ndarray:
        """Per-doc per-bit counts, chunked through the int16 scratch."""
        n = len(counts)
        ends = np.cumsum(counts)
        starts = ends - counts
        sums = np.zeros((n, 64), dtype=np.int64)
        d0 = 0
        while d0 < n:
            d1 = int(np.searchsorted(ends, starts[d0] + self._chunk_words, "right"))
            d1 = min(max(d1, d0 + 1), n)
            w0, w1 = int(starts[d0]), int(ends[d1 - 1])
            nw = w1 - w0
            if self._bits is None or nw > self._bits.shape[0]:
                self._bits = np.empty((max(nw, self._chunk_words), 64), np.int16)
            bits = self._bits[:nw]
            hc = h[w0:w1]
            for b in range(8):
                byte = ((hc >> np.uint64(8 * b)) & np.uint64(0xFF)).astype(np.intp)
                np.take(_BYTE_BITS, byte, axis=0, out=bits[:, 8 * b:8 * b + 8])
            sub_counts = counts[d0:d1]
            nz = sub_counts > 0
            if nz.any():
                if sub_counts.max() > 30_000:  # int16 reduceat would wrap
                    bits = bits.astype(np.int32)
                sums[d0:d1][nz] = np.add.reduceat(
                    bits, (starts[d0:d1] - w0)[nz], axis=0
                )
            d0 = d1
        return sums

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col].to_pylist()
        n = len(texts)
        words = pd.Series(texts, dtype=object).fillna("").str.lower().str.split()
        counts = words.str.len().to_numpy(dtype=np.int64)
        flat = words.explode().dropna()
        out = np.zeros(n, dtype=np.int64)
        if len(flat):
            h = pd.util.hash_array(flat.to_numpy(dtype=object), categorize=False)
            sums = self._bit_sums(h, counts)
            nz = counts > 0
            v = (sums[nz] * 2 > counts[nz, None]).astype(np.uint64)
            vals = (v << self._shifts[None, :]).sum(axis=1, dtype=np.uint64)
            # shift uint64 → int64 range via wraparound (two's complement)
            out[nz] = (vals - np.uint64(1 << 63)).view(np.int64)
        return pa.table({self.id_col: batch[self.id_col], "simhash": pa.array(out)})


def simhash_near_pairs(
    ds, text_col="text", id_col="doc_id", max_hamming=3, n_tables=4, num_buckets=64
):
    """SimHash near-dup candidates: hash per doc, then the generic
    banded-Hamming pairing (``hamming_near_pairs``)."""
    hashed = ds.map_batches(
        SimHasher(text_col, id_col), batch_format="pyarrow", batch_size=512
    )
    return hamming_near_pairs(
        hashed, "simhash", id_col, max_hamming, n_tables, num_buckets
    )


def hamming_near_pairs(
    ds, hash_col: str, id_col: str, max_hamming=3, n_tables=4, num_buckets=64
):
    """Near-dup pairs by Hamming distance over ANY 64-bit hash column
    (SimHash text, dHash images, …): band the hash into n_tables 16-bit
    keys (pigeonhole: ≤3 differing bits ⇒ at least one identical 16-bit
    band), bucket-group by a hash of (band, band_key), pair within each
    (band, band_key) via a vectorized self-merge, verify Hamming ≤
    max_hamming with a table-lookup popcount.  Same bucketed wide-step
    shape as ``minhash_lsh_candidates`` (parallelism = num_buckets, no
    per-group Python dispatch)."""

    def explode(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False)
        sh = t[hash_col].to_numpy(zero_copy_only=False).astype(np.uint64)
        n = len(ids)
        band = np.tile(np.arange(n_tables, dtype=np.int32), n)
        keys = np.empty(n * n_tables, dtype=np.int64)
        for b in range(n_tables):
            keys[b::n_tables] = ((sh >> np.uint64(16 * b)) & np.uint64(0xFFFF)).astype(np.int64)
        mix = keys.astype(np.uint64) ^ (
            (band.astype(np.uint64) + np.uint64(1)) * np.uint64(0x9E3779B97F4A7C15)
        )
        mix ^= mix >> np.uint64(29)
        mix *= np.uint64(0xBF58476D1CE4E5B9)
        mix ^= mix >> np.uint64(32)
        return pa.table(
            {
                "bucket": pa.array((mix % np.uint64(num_buckets)).astype(np.int32)),
                "band": pa.array(band),
                "band_key": pa.array(keys),
                id_col: pa.array(np.repeat(ids, n_tables)),
                "__h": pa.array(np.repeat(sh.astype(np.int64), n_tables)),
            }
        )

    exploded = ds.map_batches(explode, batch_format="pyarrow")

    pop8 = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint8)

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {"id_a": g[id_col][:0], "id_b": g[id_col][:0],
             "hamming": pd.Series([], dtype="int32")}
        )
        if len(g) < 2:
            return empty
        m = g.merge(g, on=["band", "band_key"], suffixes=("_a", "_b"))
        m = m[m[f"{id_col}_a"] < m[f"{id_col}_b"]]
        if m.empty:
            return empty
        x = (
            m["__h_a"].to_numpy().astype(np.uint64)
            ^ m["__h_b"].to_numpy().astype(np.uint64)
        ).view(np.uint8).reshape(-1, 8)
        ham = pop8[x].sum(axis=1).astype(np.int32)
        keep = ham <= max_hamming
        return pd.DataFrame(
            {"id_a": m[f"{id_col}_a"].to_numpy()[keep],
             "id_b": m[f"{id_col}_b"].to_numpy()[keep],
             "hamming": ham[keep]}
        )

    cand = exploded.groupby("bucket").map_groups(bucket_pairs, batch_format="pandas")

    # dedupe pairs found under multiple bands (keep min hamming) — C-side
    # bucketed reduce, same rationale as minhash_lsh_candidates
    def local_min(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby(["id_a", "id_b"], as_index=False)["hamming"].min()
        h = pd.util.hash_pandas_object(out[["id_a", "id_b"]], index=False).to_numpy()
        return out.assign(__bucket=(h % 16).astype("int64"))

    dd = cand.map_batches(local_min, batch_format="pandas")
    return dd.groupby("__bucket").map_groups(
        lambda g: g.groupby(["id_a", "id_b"], as_index=False)["hamming"].min(),
        batch_format="pandas",
    )


def similarity_join(
    ds,
    threshold: float,
    k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_buckets: int = 64,
    prefilter: bool = True,
    n_perm: int = 64,
):
    """EXACT set-similarity self-join: every pair with k-gram Jaccard ≥
    ``threshold`` — the prefix-filtering SSJoin (Chaudhuri et al. 2006;
    Xiao et al. 2008 PPJoin ordering), the deterministic sibling of the
    MinHash-LSH candidate path (LSH recall is probabilistic; this join
    is complete, so it is SQL-oracle-checkable at any threshold).

    Shape (three bucketed exchanges, never all-pairs):

    1. DF — one shingle pass counts each gram's document frequency via
       a hash(gram)-bucket reduce; the vocabulary-sized (gram, df)
       table broadcasts (ray.put), defining the PPJoin global order
       (df ascending, gram hash tiebreak — rare grams first, which is
       what keeps prefixes selective).
    2. PREFIX — second shingle pass; each doc emits ONLY its first
       ``|d| − ceil(t·|d|) + 1`` grams under that order (prefix-filter
       lemma: J ≥ t ⇒ overlap ≥ t·max(|a|,|b|) ≥ ceil(t·|d|) for both
       sides ⇒ the two prefixes share ≥ 1 gram), tagged with |d|.  ONE
       hash(gram)-bucket exchange pairs docs sharing a prefix gram;
       the size filter |d_min| ≥ t·|d_max| prunes impossible pairs
       before they leave the bucket.
    3. VERIFY — candidates dedup (bucketed_distinct), texts attach via
       the union/groupby lookup (the neardup_clusters pattern — texts
       never touch the driver), and ``ngram_jaccard_batch`` computes
       the exact ratio; pairs ≥ threshold emit (id_a, id_b, jaccard),
       id_a < id_b, jaccard rounded to 6 (the oracle convention).

    Same normalization + ≥k-chars contract as ``jaccard_range_search``
    (short docs use a fallback whole-string shingle here but produce no
    grams in SQL — keep oracle fixtures ≥ k normalized chars).

    ``prefilter=True`` (default) inserts a MinHash-signature estimate
    pass between candidate dedup and text attach (the neardup_clusters
    rule: keep est ≥ t − max(0.3, 2/√n_perm); a true pair at threshold
    fails with P < 1e-8).  On low-entropy corpora — where prefix-filter
    selectivity degenerates by construction and the candidate bulk runs
    ~500:1 over true pairs (measured 74 588 → 157 on the sf0.1 catalog
    fixture) — this keeps the expensive text shuffle + exact-Jaccard
    kernel off the bulk: signatures are 8·n_perm bytes/doc and the
    estimate is one vectorized lane-compare.  Candidates stay
    prefix-COMPLETE either way (unlike an LSH-banded candidate path,
    which is probabilistic at generation); ``prefilter=False`` is the
    reference path a test pins equality against.
    """
    import ray

    from ..hashing import hash64

    t = float(threshold)

    # ---- stage 1: global document frequencies (vocabulary-sized)
    def gram_partial(tb: pa.Table) -> pa.Table:
        texts = tb[text_col].to_pylist()
        flat, starts = _batch_shingles(texts, k)
        h, d = _unique_per_doc(flat, starts)
        hh, cnt = np.unique(h, return_counts=True)
        b = (hh % np.uint64(num_buckets)).astype(np.int32)
        return pa.table({
            "g": pa.array(hh.astype(np.int64)),
            "n": pa.array(cnt.astype(np.int64)),
            "__bucket": pa.array(b),
        })

    def df_reduce(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("g", as_index=False)["n"].sum()
        return out

    df_tbl = (
        ds.map_batches(gram_partial, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(df_reduce, batch_format="pandas")
        .to_pandas()
    )
    grams_sorted = np.sort(df_tbl["g"].to_numpy(np.int64)).astype(np.uint64)
    dfs = df_tbl.set_index("g").loc[
        grams_sorted.astype(np.int64), "n"].to_numpy(np.int64)
    df_ref = ray.put((grams_sorted, dfs))

    # ---- stage 2: prefix rows under the (df, gram) global order
    def prefix_rows(tb: pa.Table) -> pa.Table:
        gs, dfv = _bcast_get_local(df_ref)
        texts = tb[text_col].to_pylist()
        ids = tb[id_col].to_numpy(zero_copy_only=False)
        flat, starts = _batch_shingles(texts, k)
        h, d = _unique_per_doc(flat, starts)
        empty = pa.table({
            "g": pa.array([], pa.int64()),
            "id": pa.array([], pa.int64()),
            "sz": pa.array([], pa.int64()),
            "__bucket": pa.array([], pa.int32()),
        })
        if not len(h):
            return empty
        pos = np.searchsorted(gs, h)
        rank_df = dfv[np.minimum(pos, len(dfv) - 1)]
        n_d = np.bincount(d, minlength=len(ids)).astype(np.int64)
        p_d = n_d - np.ceil(t * n_d).astype(np.int64) + 1
        # order within doc by (df asc, gram asc); take first p_d
        order = np.lexsort((h, rank_df, d))
        d_o, h_o = d[order], h[order]
        run_start = np.cumsum(n_d) - n_d
        ordinal = np.arange(len(d_o)) - run_start[d_o]
        keep = ordinal < p_d[d_o]
        g_keep = h_o[keep].astype(np.int64)
        id_keep = ids[d_o[keep]]
        sz_keep = n_d[d_o[keep]]
        b = (h_o[keep] % np.uint64(num_buckets)).astype(np.int32)
        return pa.table({
            "g": pa.array(g_keep),
            "id": pa.array(id_keep, pa.int64()),
            "sz": pa.array(sz_keep),
            "pos": pa.array(ordinal[keep]),
            "__bucket": pa.array(b),
        })

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                              "id_b": pd.Series([], dtype="int64")})
        if len(g) < 2:
            return empty
        m = g.merge(g, on="g", suffixes=("_a", "_b"))
        m = m[m["id_a"] < m["id_b"]]
        if m.empty:
            return empty
        sa = m["sz_a"].to_numpy(np.int64)
        sb = m["sz_b"].to_numpy(np.int64)
        lo = np.minimum(sa, sb)
        hi = np.maximum(sa, sb)
        keep = lo >= np.ceil(t * hi).astype(np.int64)  # size filter
        # PPJoin positional filter: overlap ≤ 1 + min(remaining grams
        # after this match on either side); required overlap
        # α = ceil(t/(1+t)·(|a|+|b|)).  Completeness holds because a
        # qualifying pair's FIRST shared prefix gram (smallest
        # positions) satisfies the loosest version of this bound.
        pa_ = m["pos_a"].to_numpy(np.int64)
        pb_ = m["pos_b"].to_numpy(np.int64)
        alpha = np.ceil((t / (1.0 + t)) * (sa + sb)).astype(np.int64)
        ub = 1 + np.minimum(sa - 1 - pa_, sb - 1 - pb_)
        keep &= ub >= alpha
        return m.loc[keep, ["id_a", "id_b"]].drop_duplicates()

    from .dedup import bucketed_distinct

    cands = (
        ds.map_batches(prefix_rows, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(bucket_pairs, batch_format="pandas")
    )
    cands = bucketed_distinct(cands, ["id_a", "id_b"],
                              num_buckets=num_buckets)
    if not prefilter:
        # stage 3 consumes cands once; materialize only on the path
        # where no later execution boundary exists before the union.
        cands = cands.materialize()

    # ---- stage 2.5 (optional): signature-estimate prefilter.  Attach
    # each side's packed minhash signature (8·n_perm bytes) by the same
    # union/groupby lookup used for texts below, estimate Jaccard as the
    # matching-lane fraction, and keep only est ≥ t − max(0.3, 2/√n) —
    # the conservative neardup_clusters bound (P[drop true pair] <1e-8).
    if prefilter:
        cut = t - max(0.3, 2.0 / np.sqrt(n_perm))
        sig_ds = minhash_signatures(ds, text_col, id_col, n_perm, k)
        sig_w = 8 * n_perm
        sig_schema = pa.schema([
            ("lookup", pa.int64()),
            ("id_a", pa.int64()),
            ("id_b", pa.int64()),
            ("role", pa.int8()),
            ("sig", pa.binary()),
        ])

        def sig_pair_rows(tb: pa.Table) -> pa.Table:
            ia = tb["id_a"].to_numpy(zero_copy_only=False)
            ib = tb["id_b"].to_numpy(zero_copy_only=False)
            n = len(ia)
            return pa.table({
                "lookup": pa.array(np.concatenate([ia, ib])),
                "id_a": pa.array(np.concatenate([ia, ia])),
                "id_b": pa.array(np.concatenate([ib, ib])),
                "role": pa.array(np.repeat(np.array([0, 1], np.int8), n),
                                 pa.int8()),
                "sig": pa.nulls(2 * n, pa.binary()),
            }, schema=sig_schema)

        def sig_rows(tb: pa.Table) -> pa.Table:
            n = tb.num_rows
            sig = tb["signature"].combine_chunks()
            raw = np.ascontiguousarray(
                sig.flatten().to_numpy(zero_copy_only=False).astype("<u8")
            ).tobytes()
            off = (np.arange(n + 1, dtype=np.int32) * sig_w)
            packed = pa.Array.from_buffers(
                pa.binary(), n,
                [None, pa.py_buffer(off.tobytes()), pa.py_buffer(raw)])
            return pa.table({
                "lookup": tb[id_col].cast(pa.int64()),
                "id_a": pa.nulls(n, pa.int64()),
                "id_b": pa.nulls(n, pa.int64()),
                "role": pa.array(np.full(n, -1, np.int8), pa.int8()),
                "sig": packed,
            }, schema=sig_schema)

        def sig_bucket_of(tb: pa.Table) -> pa.Table:
            b = (hash64(tb["lookup"]) % np.uint64(num_buckets)).astype(
                np.int32)
            return tb.append_column("__bucket", pa.array(b))

        sboth = (
            cands.map_batches(sig_pair_rows, batch_format="pyarrow")
            .union(sig_ds.map_batches(sig_rows, batch_format="pyarrow"))
            .map_batches(sig_bucket_of, batch_format="pyarrow")
        )

        def sig_attach(g: pd.DataFrame) -> pd.DataFrame:
            pr = g[g["role"] >= 0]
            sx = g.loc[g["role"] == -1, ["lookup", "sig"]]
            out = pr[["lookup", "id_a", "id_b", "role"]].merge(
                sx, on="lookup", how="inner")
            out = out[["id_a", "id_b", "role", "sig"]].copy()
            out["id_a"] = out["id_a"].astype("int64")
            out["id_b"] = out["id_b"].astype("int64")
            return out

        def sig_rebucket(tb: pa.Table) -> pa.Table:
            h = hash64(tb["id_a"]) ^ (
                hash64(tb["id_b"]) * np.uint64(0x9E3779B97F4A7C15))
            return tb.append_column(
                "__pb",
                pa.array((h % np.uint64(num_buckets)).astype(np.int32)))

        def sig_filter(g: pd.DataFrame) -> pd.DataFrame:
            empty = pd.DataFrame({
                "id_a": pd.Series([], dtype="int64"),
                "id_b": pd.Series([], dtype="int64"),
            })
            if g.empty:
                return empty
            g = g.sort_values(["id_a", "id_b", "role"], kind="stable")
            a = g[g["role"] == 0].reset_index(drop=True)
            b = g[g["role"] == 1].reset_index(drop=True)
            if len(a) != len(b):
                keys_a = pd.MultiIndex.from_frame(a[["id_a", "id_b"]])
                keys_b = pd.MultiIndex.from_frame(b[["id_a", "id_b"]])
                common = keys_a.intersection(keys_b)
                a = a.set_index(["id_a", "id_b"]).loc[common].reset_index()
                b = b.set_index(["id_a", "id_b"]).loc[common].reset_index()
            if not len(a):
                return empty
            sa = np.frombuffer(b"".join(a["sig"]), dtype="<u8").reshape(
                len(a), n_perm)
            sb = np.frombuffer(b"".join(b["sig"]), dtype="<u8").reshape(
                len(b), n_perm)
            est = (sa == sb).mean(axis=1)
            keep = est >= cut
            return pd.DataFrame({
                "id_a": a.loc[keep, "id_a"].to_numpy(np.int64),
                "id_b": a.loc[keep, "id_b"].to_numpy(np.int64),
            })

        cands = (
            sboth.groupby("__bucket")
            .map_groups(sig_attach, batch_format="pandas")
            .map_batches(sig_rebucket, batch_format="pyarrow")
            .groupby("__pb")
            .map_groups(sig_filter, batch_format="pandas")
            .materialize()
        )

    # ---- stage 3: attach texts + exact verification
    union_schema = pa.schema([
        ("lookup", pa.int64()),
        ("id_a", pa.int64()),
        ("id_b", pa.int64()),
        ("role", pa.int8()),
        ("text", pa.string()),
    ])

    def pair_rows(tb: pa.Table) -> pa.Table:
        ia = tb["id_a"].to_numpy(zero_copy_only=False)
        ib = tb["id_b"].to_numpy(zero_copy_only=False)
        n = len(ia)
        return pa.table({
            "lookup": pa.array(np.concatenate([ia, ib])),
            "id_a": pa.array(np.concatenate([ia, ia])),
            "id_b": pa.array(np.concatenate([ib, ib])),
            "role": pa.array(np.repeat(np.array([0, 1], np.int8), n),
                             pa.int8()),
            "text": pa.nulls(2 * n, pa.string()),
        }, schema=union_schema)

    def text_rows(tb: pa.Table) -> pa.Table:
        n = tb.num_rows
        return pa.table({
            "lookup": tb[id_col].cast(pa.int64()),
            "id_a": pa.nulls(n, pa.int64()),
            "id_b": pa.nulls(n, pa.int64()),
            "role": pa.array(np.full(n, -1, np.int8), pa.int8()),
            "text": tb[text_col].cast(pa.string()),
        }, schema=union_schema)

    def bucket_of(tb: pa.Table) -> pa.Table:
        b = (hash64(tb["lookup"]) % np.uint64(num_buckets)).astype(np.int32)
        return tb.append_column("__bucket", pa.array(b))

    both = (
        cands.map_batches(pair_rows, batch_format="pyarrow")
        .union(ds.map_batches(text_rows, batch_format="pyarrow",
                              batch_size=1024))
        .map_batches(bucket_of, batch_format="pyarrow")
    )

    def attach(g: pd.DataFrame) -> pd.DataFrame:
        pr = g[g["role"] >= 0]
        tx = g.loc[g["role"] == -1, ["lookup", "text"]]
        out = pr[["lookup", "id_a", "id_b", "role"]].merge(
            tx, on="lookup", how="inner")
        out = out[["id_a", "id_b", "role", "text"]].copy()
        # the union's null-padded rows promote the id columns to
        # float64 in pandas; restore int64 (driver dtype gate)
        out["id_a"] = out["id_a"].astype("int64")
        out["id_b"] = out["id_b"].astype("int64")
        return out

    def rebucket(tb: pa.Table) -> pa.Table:
        h = hash64(tb["id_a"]) ^ (
            hash64(tb["id_b"]) * np.uint64(0x9E3779B97F4A7C15))
        return tb.append_column(
            "__pb", pa.array((h % np.uint64(num_buckets)).astype(np.int32)))

    attached = (
        both.groupby("__bucket")
        .map_groups(attach, batch_format="pandas")
        .map_batches(rebucket, batch_format="pyarrow")
    )

    def verify(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "id_a": pd.Series([], dtype="int64"),
            "id_b": pd.Series([], dtype="int64"),
            "jaccard": pd.Series([], dtype="float64"),
        })
        if g.empty:
            return empty
        g = g.sort_values(["id_a", "id_b", "role"], kind="stable")
        a = g[g["role"] == 0].reset_index(drop=True)
        b = g[g["role"] == 1].reset_index(drop=True)
        if len(a) != len(b):
            keys_a = pd.MultiIndex.from_frame(a[["id_a", "id_b"]])
            keys_b = pd.MultiIndex.from_frame(b[["id_a", "id_b"]])
            common = keys_a.intersection(keys_b)
            a = a.set_index(["id_a", "id_b"]).loc[common].reset_index()
            b = b.set_index(["id_a", "id_b"]).loc[common].reset_index()
        if not len(a):
            return empty
        jac = ngram_jaccard_batch(a["text"].tolist(), b["text"].tolist(), k)
        out = pd.DataFrame({
            "id_a": a["id_a"].to_numpy(),
            "id_b": a["id_b"].to_numpy(),
            "jaccard": np.round(jac, 6),
        })
        return out.loc[out["jaccard"] >= t]

    return attached.groupby("__pb").map_groups(verify, batch_format="pandas")


def _bcast_get_local(ref):
    """ray.get with a per-worker cache (the broadcast-read idiom)."""
    from .join import _bcast_get

    return _bcast_get(ref)
