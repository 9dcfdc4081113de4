"""Property-based tests (hypothesis) for the pure kernels — inputs the
deterministic fixtures never produce."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from hydra_ray.stages.neardup import (
    _batch_shingles,
    _char_shingles,
    ngram_jaccard,
    ngram_jaccard_batch,
)
from hydra_ray.stages.windows import (
    assign_tumbling,
    explode_sliding,
    sessionize_sorted,
)

texts = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), max_size=80
)


@settings(max_examples=60, deadline=None)
@given(st.lists(texts, max_size=12), st.integers(2, 8))
def test_batch_shingles_match_per_doc_property(docs, k):
    flat, starts = _batch_shingles(docs, k)
    ends = np.append(starts[1:], len(flat)) if len(docs) else starts
    for i, doc in enumerate(docs):
        got = np.unique(flat[starts[i] : ends[i]])
        ref = np.sort(_char_shingles(doc, k))
        assert np.array_equal(got, ref)


@settings(max_examples=40, deadline=None)
@given(st.lists(st.tuples(texts, texts), min_size=1, max_size=8))
def test_jaccard_batch_matches_per_pair_property(pairs):
    a = [p[0] for p in pairs]
    b = [p[1] for p in pairs]
    got = ngram_jaccard_batch(a, b, 4)
    ref = [ngram_jaccard(x, y, 4) for x, y in pairs]
    assert np.allclose(got, ref)


@settings(max_examples=60, deadline=None)
@given(
    st.lists(st.integers(-10**12, 10**12), min_size=1, max_size=50),
    st.integers(1, 10**6),
)
def test_tumbling_assignment_invariant(ts, size):
    ts = np.array(ts, dtype=np.int64)
    w = assign_tumbling(ts, size)
    assert ((w <= ts) & (ts < w + size)).all()
    assert (w % size == 0).all()


@settings(max_examples=60, deadline=None)
@given(
    st.lists(st.integers(0, 10**9), min_size=1, max_size=30),
    st.integers(1, 20),
    st.integers(1, 6),
)
def test_sliding_explosion_invariant(ts, slide, k):
    size = slide * k
    ts = np.array(ts, dtype=np.int64)
    rows, starts = explode_sliding(ts, size, slide)
    assert len(rows) == len(ts) * k
    assert ((starts <= ts[rows]) & (ts[rows] < starts + size)).all()
    # each row appears in exactly k distinct windows
    for i in range(len(ts)):
        assert len(set(starts[rows == i])) == k


@settings(max_examples=60, deadline=None)
@given(st.lists(st.integers(0, 10**6), min_size=1, max_size=50), st.integers(1, 1000))
def test_sessionize_gap_invariant(ts, gap):
    ts = np.sort(np.array(ts, dtype=np.int64))
    sid = sessionize_sorted(ts, gap)
    # ids are 0..max contiguous and non-decreasing
    assert sid[0] == 0 and (np.diff(sid) >= 0).all() and (np.diff(sid) <= 1).all()
    # breaks exactly where the gap is exceeded
    brk = np.diff(ts) > gap
    assert np.array_equal(np.diff(sid) == 1, brk)
