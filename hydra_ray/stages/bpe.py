"""Byte-pair-encoding tokenizer: distributed training + actor-pool encode.

The real token-counting path for a training corpus (the regex
``TokenStats`` estimates are a cheap proxy; sequence packing and token
budgets want the actual tokenizer's ids).  Classic BPE (Sennrich et al.
2016, arXiv:1508.07909 — public algorithm):

- TRAIN: merges are learned from the corpus's WORD-FREQUENCY table, not
  the corpus itself, so the distributed part is one bucketed word-count
  reduce (same shape as ``top_ngrams``); the driver then runs the merge
  loop over that bounded table (distinct words ≪ corpus bytes — the
  standard practical bound; ``max_words`` caps it defensively by
  frequency).  The driver loop is O(vocab · merges) on the word table —
  independent of corpus size, which is what makes whole-corpus BPE
  training feasible at 100 TB.
- ENCODE: ``BpeTokenizer`` is an actor-pool ``map_batches`` class: the
  merge ranks load once per worker; per batch it tokenizes only the
  batch's UNIQUE words (pandas factorize) through a persistent
  word→ids cache, then scatters counts/ids back to rows.  Corpus word
  distributions are Zipfian, so the cache hit-rate climbs toward 1 and
  per-batch work collapses to the factorize + a few cold words.

Word splitting is whitespace (after lower+strip), characters are the
symbol alphabet, and each word ends with the ``</w>`` end-of-word
marker — the original paper's formulation, also easy to express in a
test reference.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["train_bpe", "BpeTokenizer", "bpe_token_counts"]

_EOW = "</w>"


def _word_counts(ds, text_col: str, num_buckets: int = 32):
    """Corpus-wide (word, count) Dataset — per-batch partial counts, one
    bucketed reduce (each word lives in exactly one bucket)."""

    def partial(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(
            pc.utf8_trim_whitespace(
                pc.utf8_lower(pc.coalesce(t[text_col].combine_chunks(), ""))
            ),
            r"\s+",
        )
        flat = toks.values.to_numpy(zero_copy_only=False)
        flat = flat[flat != ""]
        words, counts = np.unique(flat, return_counts=True)
        h = pd.util.hash_array(words, categorize=False)
        return pa.table({
            "word": pa.array(words, pa.string()),
            "c": pa.array(counts.astype(np.int64)),
            "__bucket": pa.array((h % num_buckets).astype(np.int64)),
        })

    def reduce_bucket(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("word", sort=False, as_index=False)["c"].sum()
        return out

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(reduce_bucket, batch_format="pandas")
    )


def _merge_loop(words: np.ndarray, counts: np.ndarray,
                n_merges: int) -> list[tuple[str, str]]:
    """Classic BPE merge loop over a word-frequency table (driver-side,
    bounded by the table size).  Deterministic tie-break: highest pair
    count, then lexicographic pair."""
    seqs = [tuple(w) + (_EOW,) for w in words]
    cnts = counts.tolist()
    # pair -> total count, and pair -> set of word indices containing it
    pair_count: dict = {}
    pair_words: dict = {}
    for i, s in enumerate(seqs):
        c = cnts[i]
        for a, b in zip(s, s[1:]):
            pair_count[(a, b)] = pair_count.get((a, b), 0) + c
            pair_words.setdefault((a, b), set()).add(i)
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        if not pair_count:
            break
        best = max(pair_count.items(), key=lambda kv: (kv[1], kv[0]))[0]
        if pair_count[best] < 2:
            break
        merges.append(best)
        new_sym = best[0] + best[1]
        for i in list(pair_words.get(best, ())):
            s = seqs[i]
            c = cnts[i]
            # remove old pair contributions of this word
            for a, b in zip(s, s[1:]):
                pair_count[(a, b)] -= c
                if pair_count[(a, b)] <= 0:
                    pair_count.pop((a, b), None)
                ws = pair_words.get((a, b))
                if ws is not None:
                    ws.discard(i)
                    if not ws:
                        pair_words.pop((a, b), None)
            # apply the merge within the word
            out = []
            j = 0
            while j < len(s):
                if j + 1 < len(s) and s[j] == best[0] and s[j + 1] == best[1]:
                    out.append(new_sym)
                    j += 2
                else:
                    out.append(s[j])
                    j += 1
            s2 = tuple(out)
            seqs[i] = s2
            for a, b in zip(s2, s2[1:]):
                pair_count[(a, b)] = pair_count.get((a, b), 0) + c
                pair_words.setdefault((a, b), set()).add(i)
    return merges


def train_bpe(ds, text_col: str = "text", n_merges: int = 200,
              max_words: int = 100_000) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from the corpus.  The word-count
    reduce is distributed; only the (bounded, ``max_words``-capped)
    word-frequency table reaches the driver."""
    wc = _word_counts(ds, text_col).to_pandas()
    if len(wc) > max_words:  # defensive cap: keep the most frequent
        wc = wc.nlargest(max_words, "c", keep="all")
    order = np.lexsort((wc["word"].to_numpy(), -wc["c"].to_numpy()))
    words = wc["word"].to_numpy()[order]
    counts = wc["c"].to_numpy()[order]
    return _merge_loop(words, counts, n_merges)


def _encode_word(word: str, ranks: dict) -> tuple[str, ...]:
    s = tuple(word) + (_EOW,)
    while len(s) > 1:
        best_rank, best_i = None, -1
        for i in range(len(s) - 1):
            r = ranks.get((s[i], s[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        s = s[:best_i] + (s[best_i] + s[best_i + 1],) + s[best_i + 2:]
    return s


class BpeTokenizer:
    """Actor-pool encode stage: per row emits ``n_bpe_tokens``, the
    document's TRUE token count under the learned merges.

    Merge ranks build once per worker in ``__init__``; the per-word
    encode memoizes in ``self.cache`` across batches (Zipf: the cache
    converges to the corpus vocabulary, so steady-state batches pay one
    factorize plus a few cold words)."""

    def __init__(self, merges: list[tuple[str, str]], text_col: str = "text"):
        self.ranks = {tuple(m): i for i, m in enumerate(merges)}
        self.text_col = text_col
        self.cache: dict[str, int] = {}

    def _word_len(self, word: str) -> int:
        hit = self.cache.get(word)
        if hit is None:
            hit = len(_encode_word(word, self.ranks))
            self.cache[word] = hit
        return hit

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        s = batch[self.text_col].fillna("").str.lower().str.strip()
        splits = s.str.split()
        flat = [w for ws in splits for w in ws]
        codes, uniques = pd.factorize(np.asarray(flat, dtype=object))
        lens = np.array([self._word_len(w) for w in uniques], dtype=np.int64)
        per_word = lens[codes] if len(codes) else np.empty(0, np.int64)
        n_words = splits.str.len().fillna(0).astype(np.int64).to_numpy()
        ends = np.cumsum(n_words)
        starts = ends - n_words
        csum = np.zeros(len(flat) + 1, dtype=np.int64)
        np.cumsum(per_word, out=csum[1:])
        batch["n_bpe_tokens"] = csum[ends] - csum[starts]
        return batch


def bpe_token_counts(ds, merges, text_col: str = "text",
                     id_col: str = "doc_id"):
    """Per-doc true BPE token counts via the tokenizer stage."""
    tok = BpeTokenizer(merges, text_col)

    def f(df: pd.DataFrame) -> pd.DataFrame:
        out = tok(df)
        return out[[id_col, "n_bpe_tokens"]]

    return ds.map_batches(f, batch_format="pandas")
