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


def _brute_keep_first_wins(docs, L, stride):
    """Duplicated windows minus each window value's (id, pos)-least copy."""
    from collections import defaultdict

    occ = defaultdict(list)
    for i, t in docs.items():
        for p in range(0, max(0, len(t) - L + 1), 1):
            if p % stride == 0:
                occ[t[p : p + L]].append((i, p))
    out = set()
    for copies in occ.values():
        if len(copies) >= 2:
            out |= set(copies) - {min(copies)}
    return out


def test_cut_duplicate_spans_keep_first(ray_session, corpus):
    from hydra_ray.stages.substr import cut_duplicate_spans

    L = 12
    wins = _brute_keep_first_wins(corpus, L, 1)
    spans = _brute_spans(wins, L) if wins else set()
    expect = {}
    for i, t in corpus.items():
        b = t.encode("utf-8")
        ranges = sorted((s, ln) for d, s, ln in spans if d == i)
        kept, prev = [], 0
        for s, ln in ranges:
            kept.append(b[prev:s]); prev = s + ln
        kept.append(b[prev:])
        nb = b"".join(kept)
        expect[i] = (nb.decode("utf-8"), len(b) - len(nb))

    for nblocks in (1, 6):
        got = cut_duplicate_spans(_ds(corpus, nblocks), "text", "doc_id",
                                  L=L, stride=1, num_buckets=8).to_pandas()
        assert len(got) == len(corpus)
        for r in got.itertuples():
            want_text, want_cut = expect[r.doc_id]
            assert r.text == want_text, r.doc_id
            assert r.n_cut_bytes == want_cut, r.doc_id
    # the canonical copy survives: doc 3's shared run remains somewhere
    assert sum(v[1] for v in expect.values()) > 0        # something was cut
    kept_total = sum(len(v[0]) for v in expect.values())
    assert kept_total < sum(len(t) for t in corpus.values())


def test_cut_spans_snap_to_codepoint_boundaries(ray_session):
    """Stride-1 windows start at arbitrary BYTES, so span edges can land
    mid-UTF-8-codepoint; the cutter must snap outward and never emit
    U+FFFD or invalid slices (ADVICE r2)."""
    from hydra_ray.stages.substr import cut_duplicate_spans

    rep = "ßéüö-шар-δος-" * 4            # multibyte duplicated run
    docs = {
        0: "aä" + rep + "öb",            # canonical copy (kept)
        1: "céé" + rep + "üüd",          # later copy (cut) — multibyte edges
        2: "фон unique текст без повторов",
    }
    df = pd.DataFrame({"doc_id": list(docs), "text": list(docs.values())})
    got = cut_duplicate_spans(rd.from_pandas(df).repartition(2),
                              "text", "doc_id", L=12, stride=1,
                              num_buckets=4).to_pandas()
    assert len(got) == len(docs)
    by_id = dict(zip(got["doc_id"], got["text"]))
    for t in by_id.values():
        assert "�" not in t         # no replacement chars injected
        t.encode("utf-8")                # round-trips as valid UTF-8
    # the non-canonical copy lost (at least) the duplicated run
    cut_by_id = dict(zip(got["doc_id"], got["n_cut_bytes"]))
    assert cut_by_id[1] >= len(rep.encode("utf-8"))
    assert cut_by_id[2] == 0 and by_id[2] == docs[2]
