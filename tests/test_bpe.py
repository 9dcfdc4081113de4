"""BPE trainer/encoder vs the canonical naive reference (Sennrich 2016
pseudo-code: full pair-recount every iteration)."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from hydra_ray.stages.bpe import (
    BpeTokenizer,
    _encode_word,
    bpe_token_counts,
    train_bpe,
)

_EOW = "</w>"


def _naive_train(word_counts: dict, n_merges: int):
    seqs = {w: tuple(w) + (_EOW,) for w in word_counts}
    merges = []
    for _ in range(n_merges):
        pairs = {}
        for w, s in seqs.items():
            for a, b in zip(s, s[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + word_counts[w]
        if not pairs:
            break
        best = max(pairs.items(), key=lambda kv: (kv[1], kv[0]))[0]
        if pairs[best] < 2:
            break
        merges.append(best)
        for w, s in seqs.items():
            out, j = [], 0
            while j < len(s):
                if j + 1 < len(s) and (s[j], s[j + 1]) == best:
                    out.append(s[j] + s[j + 1])
                    j += 2
                else:
                    out.append(s[j])
                    j += 1
            seqs[w] = tuple(out)
    return merges


@pytest.fixture(scope="module")
def corpus():
    rng = np.random.default_rng(21)
    stems = ["walk", "talk", "jump", "read", "light", "dark", "low", "new"]
    sufs = ["", "ing", "ed", "er", "s", "est"]
    vocab = [a + b for a in stems for b in sufs]
    docs = [" ".join(rng.choice(vocab, rng.integers(5, 30)))
            for _ in range(80)]
    docs.append("")                      # empty doc
    docs.append("zzz qqq")               # chars the trainer rarely merges
    return docs


def test_train_matches_naive_reference(corpus):
    from collections import Counter

    wc = Counter(w for d in corpus for w in d.lower().split())
    want = _naive_train(dict(wc), 60)
    got = train_bpe(rd.from_items([{"text": d} for d in corpus])
                    .repartition(5), "text", n_merges=60)
    assert got == want


def test_token_counts_match_reference(ray_session, corpus):
    merges = train_bpe(rd.from_items([{"text": d} for d in corpus]),
                       "text", n_merges=60)
    ranks = {m: i for i, m in enumerate(merges)}
    df = pd.DataFrame({"doc_id": range(len(corpus)), "text": corpus})
    for nblocks in (1, 4):
        got = bpe_token_counts(
            rd.from_pandas(df).repartition(nblocks), merges
        ).to_pandas().set_index("doc_id").sort_index()
        for i, d in enumerate(corpus):
            want = sum(len(_encode_word(w, ranks))
                       for w in d.lower().split())
            assert got.loc[i, "n_bpe_tokens"] == want, (nblocks, i)
    # merging actually compresses: fewer tokens than characters+words
    chars = sum(len(w) + 1 for d in corpus for w in d.lower().split())
    assert got["n_bpe_tokens"].sum() < chars


def test_encode_word_greedy_rank_order():
    """Encoding applies merges in RANK order (lowest first), the
    standard BPE inference rule."""
    merges = [("a", "b"), ("ab", "c"), ("b", "c")]
    ranks = {m: i for i, m in enumerate(merges)}
    assert _encode_word("abc", ranks) == ("abc", _EOW)
    # "bc" only merges when "ab" can't apply first
    assert _encode_word("xbc", ranks) == ("x", "bc", _EOW)


def test_tokenizer_cache_persists(corpus):
    merges = [("i", "n"), ("in", "g")]
    tok = BpeTokenizer(merges)
    df = pd.DataFrame({"text": ["running running", "running"]})
    out = tok(df.copy())
    # "running" = r u n n ing </w> = 6 tokens
    assert out["n_bpe_tokens"].tolist() == [12, 6]
    assert "running" in tok.cache
