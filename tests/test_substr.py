"""Substring-level dup-window / dup-span detection vs a brute-force
Python reference (exact substring counting)."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from hydra_ray.stages.substr import duplicate_spans, duplicate_windows


def _brute_dup_windows(docs: dict[int, str], L: int, stride: int):
    from collections import Counter

    cnt = Counter()
    for t in docs.values():
        for p in range(0, max(0, len(t) - L + 1), 1):
            if p % stride == 0:
                cnt[t[p : p + L]] += 1
    out = set()
    for i, t in docs.items():
        for p in range(0, max(0, len(t) - L + 1), 1):
            if p % stride == 0 and cnt[t[p : p + L]] >= 2:
                out.add((i, p))
    return out


def _brute_spans(wins: set, L: int):
    spans = set()
    by_doc: dict[int, list[int]] = {}
    for i, p in wins:
        by_doc.setdefault(i, []).append(p)
    for i, ps in by_doc.items():
        ps.sort()
        start, end = ps[0], ps[0] + L
        for p in ps[1:]:
            if p > end:
                spans.add((i, start, end - start))
                start = p
            end = p + L
        spans.add((i, start, end - start))
    return spans


@pytest.fixture(scope="module")
def corpus():
    rng = np.random.default_rng(7)
    vocab = ["alpha", "bravo", "chars", "delta", "echos", "fxtrt"]
    docs = {}
    for i in range(60):
        docs[i] = " ".join(rng.choice(vocab, rng.integers(8, 40)))
    # planted long duplicate run across two docs + a within-doc repeat
    docs[60] = "zq " + docs[3][5:47] + " tail one"
    docs[61] = "prefix words " + docs[3][5:47]
    docs[62] = "solo unique text with no repeats at all xyzzy"
    rep = "repeated-block-of-text-here!"
    docs[63] = rep + " middle filler " + rep
    docs[64] = ""  # empty doc
    docs[65] = "short"  # < L
    return docs


def _ds(docs, nblocks=5):
    df = pd.DataFrame({"doc_id": list(docs), "text": list(docs.values())})
    return rd.from_pandas(df).repartition(nblocks)


@pytest.mark.parametrize("L,stride", [(12, 1), (12, 3)])
def test_duplicate_windows_matches_bruteforce(ray_session, corpus, L, stride):
    got = duplicate_windows(_ds(corpus), "text", "doc_id", L=L,
                            stride=stride, num_buckets=8).to_pandas()
    want = _brute_dup_windows(corpus, L, stride)
    assert set(zip(got["doc_id"], got["pos"])) == want
    assert len(got) == len(want)  # no duplicate emissions


def test_duplicate_spans_merge_and_partition_invariance(ray_session, corpus):
    L = 12
    want = _brute_spans(_brute_dup_windows(corpus, L, 1), L)
    for nblocks in (1, 7):
        got = duplicate_spans(_ds(corpus, nblocks), "text", "doc_id",
                              L=L, stride=1, num_buckets=8).to_pandas()
        assert set(zip(got["doc_id"], got["start"], got["length"])) == want
    # the planted cross-doc duplicate run is recovered in both docs
    by_doc = {d: (s, ln) for d, s, ln in want if d in (60, 61)}
    assert 60 in by_doc and 61 in by_doc
    # within-doc repeat marks both copies in doc 63
    assert sum(1 for d, _, _ in want if d == 63) >= 2
    # unique / empty / short docs emit nothing
    assert not any(d in (62, 64, 65) for d, _, _ in want)
