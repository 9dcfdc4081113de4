"""Feature-hashing document embeddings (`text.hash_embed`)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from hydra_ray.stages.text import hash_embed

DOCS = [
    "The data pipeline processes streaming events",
    "a quick brown fox JUMPS over the lazy dog",
    "data data data pipeline",
    "",
    "!!! 123 ...",  # no [a-z] tokens at all -> zero vector
    "streaming events arrive late sometimes",
]


def _ref_embed(text: str, dim: int, seed: int) -> np.ndarray:
    """Naive per-doc reference: same tokenization + hashing, one token
    at a time."""
    import re

    mul = ((2 * seed + 1) * 0x9E3779B97F4A7C15) % (1 << 64)
    v = np.zeros(dim, np.float64)
    for tok in re.split(r"[^a-z]+", text.lower()):
        if not tok:
            continue
        h = (int(pd.util.hash_array(np.array([tok], dtype=object),
                                    categorize=False)[0]) * mul) % (1 << 64)
        v[h % dim] += 1.0 if (h >> 63) else -1.0
    n = np.linalg.norm(v)
    return v / n if n > 0 else v


def _dataset(texts, n_blocks=1):
    import ray.data as rd

    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    ds = rd.from_arrow(t)
    return ds.repartition(n_blocks) if n_blocks > 1 else ds


def test_matches_naive_reference(ray_session):
    dim, seed = 64, 7
    out = hash_embed(_dataset(DOCS), dim=dim, seed=seed).to_pandas()
    out = out.sort_values("doc_id").reset_index(drop=True)
    for i, text in enumerate(DOCS):
        got = np.asarray(out.loc[i, "embedding"], np.float64)
        ref = _ref_embed(text, dim, seed)
        np.testing.assert_allclose(got, ref, atol=1e-6)


def test_unit_norm_and_zero_vector(ray_session):
    out = hash_embed(_dataset(DOCS), dim=32).to_pandas()
    out = out.sort_values("doc_id").reset_index(drop=True)
    for i, text in enumerate(DOCS):
        n = np.linalg.norm(np.asarray(out.loc[i, "embedding"]))
        if any(c.isalpha() for c in text):
            assert n == pytest.approx(1.0, abs=1e-5), (i, n)
        else:
            assert n == 0.0, (i, n)


def test_partition_invariance(ray_session):
    texts = [f"doc number {i} with shared vocabulary token{i % 5}"
             for i in range(40)]
    a = hash_embed(_dataset(texts, 1), dim=64).to_pandas()
    b = hash_embed(_dataset(texts, 8), dim=64).to_pandas()
    a = a.sort_values("doc_id").reset_index(drop=True)
    b = b.sort_values("doc_id").reset_index(drop=True)
    for i in range(len(texts)):
        np.testing.assert_array_equal(
            np.asarray(a.loc[i, "embedding"]),
            np.asarray(b.loc[i, "embedding"]))


def test_composes_with_cosine_topk_planted_copy(ray_session):
    """A verbatim copy embeds identically -> its nearest neighbour by
    cosine is the copy at similarity ~1."""
    from hydra_ray.stages.similarity import cosine_topk

    # NOTE digits are token separators ([^a-z]+): distinguishers must
    # be alphabetic or every doc embeds identically
    texts = [
        f"unique filler text item{chr(97 + i)} about "
        f"topic{chr(97 + i % 7)} " + "pad " * (i % 4)
        for i in range(26)
    ]
    texts.append(texts[3])  # doc 26 copies doc 3
    emb = hash_embed(_dataset(texts), dim=128).materialize()
    probe = emb.to_pandas()
    q = np.asarray(
        probe.loc[probe["doc_id"] == 26, "embedding"].iloc[0],
        np.float32)[None, :]
    res = cosine_topk(emb, np.array([26]), q, k=2,
                      id_col="doc_id").to_pandas()
    hits = set(res.loc[res["cosine"] > 0.999, "doc_id"])
    assert hits == {3, 26}
