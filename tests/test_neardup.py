"""Near-dup kernels: vectorized batch paths vs per-doc reference kernels,
LSH candidate invariance to bucketing, and planted-cluster recovery."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from hydra_ray.stages.neardup import (
    MinHasher,
    SimHasher,
    _batch_shingles,
    _char_shingles,
    minhash_lsh_candidates,
    neardup_clusters,
    ngram_jaccard,
)

DOCS = [
    "the quick brown fox jumps over the lazy dog",
    "the quick brown fox jumped over the lazy dog",   # near-dup of 0
    "completely different content about streaming engines",
    "completely different content about streaming engines",  # exact dup of 2
    "tiny",                                           # shorter than k
    "",                                               # empty
    "  the   quick  brown fox jumps over the lazy dog  ",  # whitespace-normalized dup of 0
    "another unrelated document with many unique words here",
]


def test_batch_shingles_match_per_doc():
    flat, starts = _batch_shingles(DOCS, k=5)
    ends = np.append(starts[1:], len(flat))
    for i, doc in enumerate(DOCS):
        got = np.unique(flat[starts[i] : ends[i]])
        ref = np.sort(_char_shingles(doc, 5))
        assert np.array_equal(got, ref), f"doc {i}"


def test_minhash_signature_batch_matches_per_doc():
    mh = MinHasher(n_perm=32, k=5)
    batch = pa.table({"doc_id": pa.array(range(len(DOCS))), "text": pa.array(DOCS)})
    out = mh(batch)
    sigs = out["signature"].combine_chunks().flatten().to_numpy().reshape(len(DOCS), 32)
    for i, doc in enumerate(DOCS):
        assert np.array_equal(sigs[i], mh.signature(doc)), f"doc {i}"


def _naive_simhash(text: str) -> int:
    words = np.array((text or "").lower().split(), dtype=object)
    if len(words) == 0:
        return 0
    h = pd.util.hash_array(words, categorize=False)
    bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1).astype(np.int32)
    v = np.where(bits.sum(axis=0) * 2 > len(words), 1, 0).astype(np.uint64)
    return int((v << np.arange(64, dtype=np.uint64)).sum()) - (1 << 63)


def test_simhash_batch_matches_per_doc():
    sh = SimHasher()
    batch = pa.table({"doc_id": pa.array(range(len(DOCS))), "text": pa.array(DOCS)})
    got = sh(batch)["simhash"].to_pylist()
    assert got == [_naive_simhash(d) for d in DOCS]


def test_simhash_chunked_scratch_matches_whole_batch():
    """Doc-aligned chunking through the tiny scratch must not change bits —
    force chunk boundaries inside the batch (chunk_words smaller than the
    batch's word total, docs straddling the cap, empty docs between)."""
    docs = ["alpha beta gamma " * 9, "", "one two", "x " * 25, None,
            "delta epsilon zeta eta theta", "solo"]
    batch = pa.table({"doc_id": pa.array(range(len(docs))),
                      "text": pa.array(docs, pa.string())})
    big = SimHasher()(batch)["simhash"].to_pylist()
    tiny = SimHasher(chunk_words=8)(batch)["simhash"].to_pylist()
    assert tiny == big
    assert big == [_naive_simhash(d) for d in docs]


@pytest.fixture()
def corpus_ds(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(7)
    vocab = [f"w{i}" for i in range(500)]
    texts, ids = [], []
    for i in range(120):
        base = " ".join(rng.choice(vocab, size=30))
        texts.append(base)
        ids.append(3 * i)
        # planted near-dup: one word changed
        words = base.split()
        words[5] = "CHANGED"
        texts.append(" ".join(words))
        ids.append(3 * i + 1)
        # exact dup
        texts.append(base)
        ids.append(3 * i + 2)
    return rd.from_arrow(pa.table({"doc_id": pa.array(ids), "text": pa.array(texts)}))


def test_lsh_candidates_invariant_to_buckets(corpus_ds):
    a = minhash_lsh_candidates(corpus_ds, num_buckets=7).to_pandas()
    b = minhash_lsh_candidates(corpus_ds, num_buckets=256).to_pandas()
    ka = sorted(map(tuple, a[["id_a", "id_b"]].to_numpy()))
    kb = sorted(map(tuple, b[["id_a", "id_b"]].to_numpy()))
    assert ka == kb and len(ka) > 0


def test_neardup_clusters_recovers_planted(corpus_ds):
    out = neardup_clusters(corpus_ds, threshold=0.6)
    # every planted triple (3i, 3i+1, 3i+2) should land in one cluster
    clusters = out.set_index("doc_id")["cluster_id"]
    hits = 0
    for i in range(120):
        trio = [3 * i, 3 * i + 1, 3 * i + 2]
        if all(t in clusters.index for t in trio):
            if len({clusters[t] for t in trio}) == 1:
                hits += 1
    assert hits >= 110  # LSH at default bands recovers nearly all triples


def test_ngram_jaccard_identity_and_disjoint():
    assert ngram_jaccard("hello world", "hello world") == 1.0
    assert ngram_jaccard("aaaaaaa", "bbbbbbb") == 0.0


def test_ngram_jaccard_batch_matches_per_pair():
    from hydra_ray.stages.neardup import ngram_jaccard_batch

    pairs_a = [DOCS[i] for i in (0, 0, 2, 4, 5, 6)]
    pairs_b = [DOCS[j] for j in (1, 6, 3, 5, 5, 7)]
    got = ngram_jaccard_batch(pairs_a, pairs_b, 5)
    ref = [ngram_jaccard(a, b, 5) for a, b in zip(pairs_a, pairs_b)]
    assert np.allclose(got, ref), (got, ref)


def test_jaccard_range_search_matches_per_pair(ray_session):
    import ray.data as rd

    from hydra_ray.stages.neardup import jaccard_range_search

    docs = [d for d in DOCS if d and len(" ".join(d.split())) >= 5]
    ids = list(range(len(docs)))
    ds = rd.from_arrow(
        pa.table({"doc_id": pa.array(ids, pa.int64()), "text": pa.array(docs)})
    )
    probes = docs[:3]
    out = jaccard_range_search(ds, ids[:3], probes, threshold=0.3).to_pandas()
    got = {
        (int(r.probe_id), int(r.doc_id)): r.jaccard for r in out.itertuples()
    }
    for pi, pt in zip(ids[:3], probes):
        for di, dt in zip(ids, docs):
            ref = ngram_jaccard(pt, dt, 5)
            if ref >= 0.3:
                assert (pi, di) in got and abs(got[(pi, di)] - ref) < 1e-12
            else:
                assert (pi, di) not in got


def test_embedding_neardup_lsh_matches_exact(ray_session):
    """Sign-projection LSH finds the planted high-cosine pairs the exact
    broadcast kernel finds (deterministic under the fixed seed)."""
    import ray.data as rd

    from hydra_ray.stages.similarity import (
        embedding_neardup_lsh,
        embedding_neardup_pairs,
    )

    rng = np.random.default_rng(7)
    base = rng.standard_normal((40, 32))
    # plant 6 near-dup pairs: tiny perturbations of the first 6 vectors
    near = base[:6] + 0.02 * rng.standard_normal((6, 32))
    mat = np.vstack([base, near])
    ids = np.arange(len(mat))
    ds = rd.from_arrow(
        pa.table({"vec_id": ids, "embedding": list(mat.astype(np.float32))})
    )
    exact = (
        embedding_neardup_pairs(ds, threshold=0.95)
        .to_pandas()[["id_a", "id_b"]]
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
    )
    assert len(exact) == 6
    lsh = (
        embedding_neardup_lsh(ds, threshold=0.95, max_hamming=8)
        .to_pandas()[["id_a", "id_b"]]
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(lsh, exact, check_dtype=False)


def test_ngram_overlap_probe_matches_bruteforce(ray_session):
    import ray.data as rd

    from hydra_ray.stages.neardup import ngram_overlap_probe

    def grams(t, n=3):
        toks = " ".join((t or "").lower().split()).split(" ")
        return {" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)}

    docs = [
        "a b c d e f g",            # probe 0
        "x y z a b c d q r",        # shares 'a b c'/'b c d' with probe 0
        "a b c d e zz",             # shares 3 grams with probe 0
        "completely different words here now",
        "a  B c D e f g",           # whitespace/case-normalized dup of 0
        "",                         # empty
        "tiny doc",                 # < n tokens
    ]
    ids = list(range(len(docs)))
    ds = rd.from_arrow(
        pa.table({"doc_id": pa.array(ids, pa.int64()),
                  "text": pa.array(docs, pa.string())})
    ).repartition(3)
    out = ngram_overlap_probe(ds, [0], [docs[0]], min_overlap=2, n=3).to_pandas()
    got = {(r.probe_id, r.doc_id): r.n_overlap for r in out.itertuples()}
    pg = grams(docs[0])
    for i, d in enumerate(docs):
        ov = len(pg & grams(d))
        if ov >= 2:
            assert got[(0, i)] == ov, (i, ov)
        else:
            assert (0, i) not in got
