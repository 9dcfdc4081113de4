"""Text analysis operators for training-data pipelines.

Beyond the reference's operator set (required components of this engine):
language-ID (n-gram heuristic), quality scoring, token counting and
document fingerprinting, all vectorized over Arrow/pandas batches.
Stateful pieces (compiled regexes, stopword tables, language profiles)
live in callable classes → actor pools via ``map_batches(Cls, ...)``.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

__all__ = [
    "TokenStats",
    "QualityScore",
    "CompressionRatio",
    "LangId",
    "Fingerprint",
    "Redactor",
    "chunk_tokens",
    "explode_tokens",
    "repetition_stats",
    "tfidf_top_terms",
    "top_ngrams",
    "levenshtein_probe",
]

_STOPWORDS = {
    "en": {"the", "a", "of", "to", "and", "in", "is", "it", "that", "for"},
    "de": {"der", "die", "das", "und", "ist", "ein", "zu", "mit", "von", "den"},
    "es": {"el", "la", "de", "que", "y", "en", "un", "es", "se", "no"},
    "fr": {"le", "la", "de", "et", "un", "est", "que", "en", "du", "une"},
}


class TokenStats:
    """n_tokens / n_chars per document (whitespace + BPE-ish word regex)."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        self.word_re = re.compile(r"[\w']+|[^\w\s]", re.U)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        s = batch[self.text_col].fillna("")
        # trim before counting so leading/trailing whitespace doesn't add
        # tokens — matches DuckDB string_split_regex(trim(text), '\s+')
        stripped = s.str.strip()
        batch["n_tokens"] = (
            stripped.str.count(r"\s+") + (stripped.str.len() > 0).astype(int)
        ).astype("int64")
        batch["n_words"] = s.str.count(r"[\w']+").astype("int64")
        batch["n_chars_text"] = s.str.len().astype("int64")
        return batch


class QualityScore:
    """Heuristic quality features: length, punctuation ratio, stopword
    ratio, mean word length, repetition ratio — the usual pre-training
    corpus filters."""

    def __init__(self, text_col: str = "text", lang_col: str | None = "lang"):
        self.text_col = text_col
        self.lang_col = lang_col

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        s = batch[self.text_col].fillna("")
        n = s.str.len().clip(lower=1)
        batch["punct_ratio"] = (s.str.count(r"[^\w\s]") / n).astype("float64")
        n_words = s.str.count(r"[a-zA-Z']+").clip(lower=1)
        word_chars = s.str.count(r"[a-zA-Z']")
        batch["mean_word_len"] = (word_chars / n_words).astype("float64")
        langs = (
            batch[self.lang_col]
            if self.lang_col and self.lang_col in batch
            else pd.Series(["en"] * len(batch), index=batch.index)
        )
        # one vectorized alternation count per language over its doc subset
        lower = s.str.lower()
        stop_hits = np.zeros(len(batch), dtype=np.int64)
        lang_np = langs.fillna("en").to_numpy()
        for lg in np.unique(lang_np):
            words = _STOPWORDS.get(lg, _STOPWORDS["en"])
            rx = r"\b(?:" + "|".join(sorted(words)) + r")\b"
            m = lang_np == lg
            stop_hits[m] = lower[m].str.count(rx).to_numpy()
        batch["stopword_ratio"] = (stop_hits / n_words.to_numpy()).astype("float64")
        # repetition needs per-doc unique words: maximal [a-zA-Z']+ runs
        # are exactly the split on their complement, so one Arrow replace
        # + split pass then the repetition_stats factorize/run-length
        # kernel — no Python per row
        arr = pa.array(s.to_numpy(dtype=object), pa.string())
        toks = pc.split_pattern_regex(
            pc.utf8_trim_whitespace(
                pc.replace_substring_regex(arr, r"[^a-zA-Z']+", " ")
            ),
            r"\s+",
        )
        flat = toks.values.to_numpy(zero_copy_only=False)
        offsets = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        ndocs = len(batch)
        parent = np.repeat(np.arange(ndocs, dtype=np.int64), np.diff(offsets))
        nonempty = flat != ""          # an empty doc splits to one "" token
        flat, parent = flat[nonempty], parent[nonempty]
        codes = pd.factorize(flat)[0] if len(flat) else np.array([], np.int64)
        key = parent * np.int64(len(flat) + 1) + codes
        key.sort()
        first = np.r_[True, key[1:] != key[:-1]] if len(key) else np.array([], bool)
        run_doc = key[np.flatnonzero(first)] // np.int64(len(flat) + 1)
        uniq = np.bincount(run_doc.astype(np.int64), minlength=ndocs)
        batch["repetition_ratio"] = (
            1.0 - uniq / n_words.to_numpy()
        ).astype("float64")
        batch["quality_score"] = (
            0.4 * (1.0 - batch["repetition_ratio"])
            + 0.3 * (1.0 - batch["punct_ratio"].clip(0, 1))
            + 0.3 * batch["stopword_ratio"].clip(0, 0.6) / 0.6
        ).astype("float64")
        return batch


class LangId:
    """Stopword-profile language heuristic (vectorized).

    A deterministic stand-in for fastText-style LID: per language, ONE
    compiled alternation regex counts marker-word hits over the whole
    column in C (`pandas.str.count`); argmax across languages.  The real
    model would load in ``__init__`` the same way — once per actor.
    """

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        self.lang_res = {
            lang: re.compile(r"\b(?:" + "|".join(sorted(words)) + r")\b")
            for lang, words in _STOPWORDS.items()
        }

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        texts = batch[self.text_col].fillna("").str.lower()
        n_words = texts.str.count(r"[\w']+").clip(lower=1)
        langs = list(self.lang_res)
        hits = np.stack(
            [texts.str.count(rx).to_numpy() for rx in self.lang_res.values()]
        )  # (n_langs, n_rows)
        scores = hits / n_words.to_numpy()
        best = scores.argmax(axis=0)
        best_score = scores[best, np.arange(scores.shape[1])]
        batch["lang_pred"] = np.where(
            best_score > 0.0, np.array(langs, dtype=object)[best], "und"
        )
        batch["lang_score"] = best_score.astype("float64")
        return batch


class Fingerprint:
    """Deterministic document fingerprint: 64-bit rolling hash over the
    normalized text (stable across runs/processes)."""

    def __init__(self, text_col: str = "text", out_col: str = "fingerprint"):
        self.text_col = text_col
        self.out_col = out_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col].to_numpy(zero_copy_only=False)
        norm = pd.Series(texts).fillna("").str.lower().str.replace(r"\s+", " ", regex=True)
        h = pd.util.hash_array(norm.to_numpy(dtype=object), categorize=False)
        return batch.append_column(self.out_col, pa.array(h.astype(np.int64)))


class CompressionRatio:
    """Deflate compression ratio as a repetitiveness quality signal.

    ``compressed_bytes / utf8_bytes`` at a fixed zlib level: highly
    templated / repetitive documents compress far below natural prose
    (the Gopher/CCNet-family corpus filter; complements the token-level
    ``repetition_stats``).  Empty text → null.  Per-doc ``zlib.compress``
    is one C call per document (libz streams, no Python inner loop) —
    the same per-row-C shape as ``Redactor``.  Deterministic for a fixed
    zlib version+level, so the operator is pytest-exact (no SQL oracle:
    DuckDB exposes no deflate)."""

    def __init__(self, text_col: str = "text", out_col: str = "compression_ratio",
                 level: int = 6):
        self.text_col = text_col
        self.out_col = out_col
        self.level = level

    def __call__(self, batch: pa.Table) -> pa.Table:
        import zlib

        texts = batch[self.text_col].to_numpy(zero_copy_only=False)
        lvl = self.level
        out = np.full(len(texts), np.nan)
        for i, t in enumerate(texts):
            if t:
                raw = t.encode("utf-8")
                out[i] = len(zlib.compress(raw, lvl)) / len(raw)
        return batch.append_column(self.out_col, pa.array(out, pa.float64()))


class Redactor:
    """Pattern scrubbing (PII-style redaction): replace every match of
    each configured regex with its placeholder, counting replacements.

    The standard pre-training cleanup pass (emails, phones, URLs, ids —
    any compilable pattern).  Patterns compile ONCE in ``__init__`` (the
    per-actor/worker state convention), each batch is two vectorized
    pandas ``.str`` passes per pattern (count, then replace).  Pure
    per-batch map: no shuffle, stable under repartitioning.

    Patterns must stay in the RE2-compatible subset (no backreferences /
    lookaround) so a DuckDB ``regexp_replace(..., 'g')`` oracle computes
    byte-identical output.
    """

    def __init__(self, patterns: list[tuple[str, str]], text_col: str = "text",
                 out_col: str = "text", count_col: str = "n_redacted"):
        self.compiled = [(re.compile(p), repl) for p, repl in patterns]
        self.text_col, self.out_col, self.count_col = text_col, out_col, count_col

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        s = batch[self.text_col].fillna("")
        total = np.zeros(len(s), dtype=np.int64)
        for pat, repl in self.compiled:
            total += s.str.count(pat).to_numpy(dtype=np.int64)
            s = s.str.replace(pat, repl, regex=True)
        batch[self.out_col] = s
        batch[self.count_col] = total
        return batch


def explode_tokens(ds, text_col: str = "text", id_col: str = "doc_id",
                   out_col: str = "token"):
    """Explode each document into one row per whitespace token (SQL
    ``unnest(string_split_regex(trim(text), '\\s+'))``) — the unnest /
    flatten relational primitive, and the front half of any
    token-granular pipeline.

    Pure per-batch map, no shuffle: one Arrow ``split_pattern_regex``
    pass gives flat values + offsets; ``list_parent_indices`` replicates
    the id column without ever touching Python rows.  Output rows ≈
    corpus token count — downstream consumers should aggregate or
    filter before any wide exchange.
    """
    import pyarrow.compute as pc

    def f(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(
            pc.utf8_trim_whitespace(pc.coalesce(t[text_col].combine_chunks(), "")),
            r"\s+",
        )
        parent = pc.list_parent_indices(toks)
        return pa.table({
            id_col: pc.take(t[id_col].combine_chunks(), parent),
            out_col: toks.values,
        })

    return ds.map_batches(f, batch_format="pyarrow")


def chunk_tokens(ds, text_col: str = "text", id_col: str = "doc_id",
                 size: int = 128, stride: int = 96):
    """Split each document into overlapping token windows of ``size``
    tokens advancing by ``stride`` — the chunking step before embedding /
    retrieval indexing.  A doc with n tokens yields
    ``max(1, ceil((n − size)/stride) + 1)`` chunks; the last may be
    shorter; a short doc yields itself.

    Pure per-batch map, no shuffle.  Vectorized end to end: one Arrow
    split pass → flat tokens + offsets; all chunks' token indices are
    built with arange/repeat arithmetic, gathered with ONE Arrow
    ``take``, and joined with ONE ``binary_join`` over a ListArray —
    no Python per doc or per chunk.
    """
    import pyarrow.compute as pc

    if stride <= 0 or size <= 0:
        raise ValueError("size and stride must be positive")

    def f(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(
            pc.utf8_trim_whitespace(pc.coalesce(t[text_col].combine_chunks(), "")),
            r"\s+",
        )
        flat = toks.values
        offsets = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        n_tok = np.diff(offsets)
        # chunks per doc
        nc = np.maximum(1, -((n_tok - size) // -stride) + 1).astype(np.int64)
        total_c = int(nc.sum())
        if total_c == 0:
            return pa.table({id_col: t[id_col].slice(0, 0),
                             "chunk_idx": pa.array([], pa.int64()),
                             "chunk": pa.array([], pa.string())})
        doc_of_chunk = np.repeat(np.arange(len(nc), dtype=np.int64), nc)
        cum_c = np.cumsum(nc) - nc
        chunk_idx = np.arange(total_c, dtype=np.int64) - cum_c[doc_of_chunk]
        starts = offsets[:-1][doc_of_chunk] + chunk_idx * stride
        ends = np.minimum(starts + size, offsets[1:][doc_of_chunk])
        lens = np.maximum(ends - starts, 0)
        total_t = int(lens.sum())
        cum_l = np.cumsum(lens) - lens
        tok_idx = (np.arange(total_t, dtype=np.int64)
                   - np.repeat(cum_l, lens)
                   + np.repeat(starts, lens))
        gathered = flat.take(pa.array(tok_idx))
        list_offs = pa.array(np.concatenate([[0], np.cumsum(lens)]), pa.int32())
        chunks = pc.binary_join(
            pa.ListArray.from_arrays(list_offs, gathered), " "
        )
        return pa.table({
            id_col: t[id_col].take(pa.array(doc_of_chunk)),
            "chunk_idx": pa.array(chunk_idx, pa.int64()),
            "chunk": chunks,
        })

    return ds.map_batches(f, batch_format="pyarrow")


def repetition_stats(ds, text_col: str = "text", id_col: str = "doc_id"):
    """Per-document repetition signals (Gopher-style quality rules over
    token repetition): token count, distinct-token count, duplicate
    fraction ``1 − distinct/total`` and top-token fraction
    ``max_count/total``.  High values flag boilerplate / degenerate
    docs for corpus filtering.

    Pure per-batch map: one Arrow split pass, one ``pd.factorize`` over
    the batch's flat tokens (exact, C-side), then run-length math on the
    lexsorted ``(doc, token_code)`` pairs — no Python per doc, no
    shuffle (each doc's stats depend only on its own tokens).
    """
    import pyarrow.compute as pc

    def f(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(
            pc.utf8_trim_whitespace(pc.coalesce(t[text_col].combine_chunks(), "")),
            r"\s+",
        )
        flat = toks.values.to_numpy(zero_copy_only=False)
        offsets = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        n_tok = np.diff(offsets)
        ndocs = len(n_tok)
        codes = pd.factorize(flat)[0] if len(flat) else np.array([], np.int64)
        parent = np.repeat(np.arange(ndocs, dtype=np.int64), n_tok)
        # sort (doc, code) pairs once; runs = per-doc distinct tokens
        key = parent * np.int64(len(flat) + 1) + codes
        key.sort()
        first = np.r_[True, key[1:] != key[:-1]] if len(key) else np.array([], bool)
        run_start = np.flatnonzero(first)
        run_len = np.diff(np.append(run_start, len(key)))
        run_doc = (key[run_start] // np.int64(len(flat) + 1)) if len(key) else run_start
        n_distinct = np.bincount(run_doc, minlength=ndocs).astype(np.int64)
        top_cnt = np.zeros(ndocs, dtype=np.int64)
        np.maximum.at(top_cnt, run_doc, run_len)
        tot = np.maximum(n_tok, 1).astype(np.float64)
        return pa.table({
            id_col: t[id_col],
            "n_tokens": pa.array(n_tok, pa.int64()),
            "n_distinct": pa.array(n_distinct, pa.int64()),
            "dup_token_frac": pa.array(1.0 - n_distinct / tot),
            "top_token_frac": pa.array(top_cnt / tot),
        })

    return ds.map_batches(f, batch_format="pyarrow")


def token_entropy(ds, text_col: str = "text", id_col: str = "doc_id"):
    """Per-document Shannon entropy (base 2) of the unigram token
    distribution — the vocabulary-diversity quality signal (low entropy
    flags degenerate/boilerplate docs; pairs with ``repetition_stats``).

    Pure per-batch map, no shuffle (a doc's tokens are local to its
    batch): one Arrow regex split, one ``pd.factorize``, then run-length
    math over the lexsorted ``(doc, token_code)`` pairs and
    ``H = log2(n) − Σ c·log2(c) / n`` from bincount partials — the same
    order-stable form the ``type_entropy`` oracle uses.
    """
    import pyarrow.compute as pc

    def f(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(
            pc.utf8_trim_whitespace(pc.coalesce(t[text_col].combine_chunks(), "")),
            r"\s+",
        )
        flat = toks.values.to_numpy(zero_copy_only=False)
        offsets = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        n_tok = np.diff(offsets)
        ndocs = len(n_tok)
        codes = pd.factorize(flat)[0] if len(flat) else np.array([], np.int64)
        parent = np.repeat(np.arange(ndocs, dtype=np.int64), n_tok)
        key = parent * np.int64(len(flat) + 1) + codes
        key.sort()
        first = np.r_[True, key[1:] != key[:-1]] if len(key) else np.array([], bool)
        run_start = np.flatnonzero(first)
        run_len = np.diff(np.append(run_start, len(key))).astype(np.float64)
        run_doc = (key[run_start] // np.int64(len(flat) + 1)) if len(key) else run_start
        sclog = np.zeros(ndocs, dtype=np.float64)
        np.add.at(sclog, run_doc, run_len * np.log2(run_len))
        n = np.maximum(n_tok, 1).astype(np.float64)
        ent = np.log2(n) - sclog / n
        return pa.table({
            id_col: t[id_col],
            "n_tokens": pa.array(n_tok, pa.int64()),
            "token_entropy": pa.array(ent),
        })

    return ds.map_batches(f, batch_format="pyarrow")


def normalize_text(ds, text_col: str = "text", out_col: str = "text",
                   strip_marks: bool = True, lower: bool = True,
                   collapse_ws: bool = True):
    """Canonical text normalization for corpus preparation: Unicode NFC,
    accent/diacritic stripping (canonical decompose → drop combining
    marks → recompose, matching DuckDB/utf8proc ``strip_accents``
    semantics: ``ß`` and the ``ﬁ`` ligature survive, ``é``/``ï`` fold),
    lowercasing, and whitespace collapse — the dedup-priming transform
    run before fingerprinting / MinHash.

    Entirely Arrow kernels (``utf8_normalize`` / ``replace_substring_
    regex`` / ``utf8_lower``), zero Python per row, no shuffle.
    """
    import pyarrow.compute as pc

    def f(t: pa.Table) -> pa.Table:
        s = pc.coalesce(t[text_col].combine_chunks(), "")
        s = pc.utf8_normalize(s, form="NFC")
        if strip_marks:
            nfd = pc.utf8_normalize(s, form="NFD")
            s = pc.utf8_normalize(
                pc.replace_substring_regex(nfd, r"\p{Mn}", ""), form="NFC")
        if lower:
            s = pc.utf8_lower(s)
        if collapse_ws:
            s = pc.utf8_trim_whitespace(
                pc.replace_substring_regex(s, r"\s+", " "))
        i = t.schema.get_field_index(out_col)
        if i >= 0:
            return t.set_column(i, out_col, s)
        return t.append_column(out_col, s)

    return ds.map_batches(f, batch_format="pyarrow")


def top_ngrams(ds, text_col: str = "text", n: int = 2, k: int = 20,
               sep: str = " ", num_buckets: int = 32):
    """Exact corpus-wide top-``k`` token ``n``-grams by count (ties
    broken by ascending n-gram) — collocation mining / boilerplate
    detection over a training corpus.

    Scale shape: (1) per-batch PARTIAL counts — tokens come out of one
    Arrow ``split_pattern`` pass (flat values + offsets, no Python row
    loop), n-grams are a vectorized join of the flat token array against
    its own shifts with windows crossing a document boundary masked off,
    and each batch emits at most its distinct-n-gram rows; (2) ONE
    bucketed reduce over hash(ngram) — every n-gram lives in exactly one
    bucket, so a per-bucket top-``k`` after summing is globally sound;
    (3) the k·num_buckets survivors merge on the driver.  The shuffle
    carries distinct-per-batch counts, never token instances.
    """
    import pyarrow.compute as pc

    from ..hashing import hash64

    def partial(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern(
            pc.coalesce(t[text_col].combine_chunks(), ""), sep
        )
        flat = toks.values.to_numpy(zero_copy_only=False)
        offsets = toks.offsets.to_numpy(zero_copy_only=False)
        empty = pa.table({"ngram": pa.array([], pa.string()),
                          "n": pa.array([], pa.int64()),
                          "__bucket": pa.array([], pa.int64())})
        if len(flat) < n:
            return empty
        m = len(flat) - n + 1
        # windows whose tokens straddle a doc boundary are invalid: for
        # boundary b, starts b-1 … b-n+1 span it (same scatter trick as
        # neardup._batch_shingles)
        valid = np.ones(m, dtype=bool)
        bnd = offsets[1:-1].astype(np.int64)
        for j in range(1, n):
            idx = bnd - j
            valid[idx[(idx >= 0) & (idx < m)]] = False
        if not valid.any():
            return empty
        parts = [pd.Series(flat[j:j + m], dtype=object)[valid] for j in range(n)]
        grams = parts[0].str.cat(parts[1:], sep=sep)
        counts = grams.value_counts(sort=False)
        g = pd.DataFrame({"ngram": counts.index.to_numpy(dtype=object),
                          "n": counts.to_numpy(dtype=np.int64)})
        b = (hash64(g["ngram"].to_numpy(dtype=object)) % np.uint64(num_buckets)).astype(np.int64)
        return pa.Table.from_pandas(g.assign(__bucket=b), preserve_index=False)

    def reduce_topk(g: pd.DataFrame) -> pd.DataFrame:
        summed = g.groupby("ngram", as_index=False)["n"].sum()
        pos = np.lexsort((summed["ngram"].to_numpy(dtype=object),
                          -summed["n"].to_numpy(np.int64)))[:k]
        return summed.iloc[pos]

    survivors = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(reduce_topk, batch_format="pandas")
        .to_pandas()  # ≤ k·num_buckets rows
    )
    pos = np.lexsort((survivors["ngram"].to_numpy(dtype=object),
                      -survivors["n"].to_numpy(np.int64)))[:k]
    return pa.Table.from_pandas(survivors.iloc[pos].reset_index(drop=True),
                                preserve_index=False)


def tfidf_top_terms(ds, text_col: str = "text", id_col: str = "doc_id",
                    k: int = 3, num_buckets: int = 32):
    """Top-``k`` terms per document by tf·idf (score = tf · ln(N/df),
    ties broken by ascending term so output is order-independent).

    Tokenization is ``lower(text)`` split on ``[^a-z]+`` — byte-for-byte
    the DuckDB ``string_split_regex`` oracle's convention.

    Shape: (1) per-batch term frequencies — every doc lives in one row,
    so TF needs no shuffle; (2) document frequencies via ONE bucketed
    reduce over hash(term) (each (doc, term) appears once, so partials
    are plain row counts); (3) the df table is vocabulary-sized — tiny
    next to the corpus — so it broadcasts via ``ray.put`` and scoring +
    per-doc top-k run per batch with no further shuffle.  For an open
    vocabulary too large to broadcast, swap step 3 for a bucketed join
    on term (`stages/join.py bucketed_join`).
    """
    import ray

    from ..hashing import hash64

    n_docs = ds.count()  # parquet metadata count: no data pass

    def term_freqs(t: pa.Table) -> pa.Table:
        s = pd.Series(t[text_col].to_pylist(), dtype=object).fillna("").str.lower()
        toks = s.str.split(r"[^a-z]+")
        counts = toks.str.len().to_numpy(dtype=np.int64)
        ids = t[id_col].to_numpy(zero_copy_only=False)
        doc = np.repeat(ids, counts)
        flat = toks.explode().to_numpy(dtype=object)
        # empty docs explode to NaN; the split regex also yields '' edges
        keep = pd.notna(flat) & (flat != "")
        tf = (
            pd.DataFrame({"doc_id": doc[keep], "term": flat[keep]})
            .groupby(["doc_id", "term"], as_index=False, sort=False)
            .size()
            .rename(columns={"size": "tf"})
        )
        return pa.Table.from_pandas(tf, preserve_index=False)

    # cache the (doc, term, tf) rows: consumed by the df reduce AND the
    # scoring pass; columnar, object-store resident (spills), and cheaper
    # than re-tokenizing the corpus twice
    tf_ds = ds.map_batches(term_freqs, batch_format="pyarrow").materialize()

    def df_partial(t: pa.Table) -> pa.Table:
        g = (
            t.select(["term"]).to_pandas()
            .groupby("term", as_index=False, sort=False).size()
            .rename(columns={"size": "df"})
        )
        b = (hash64(g["term"].to_numpy(dtype=object)) % np.uint64(num_buckets)).astype(np.int64)
        return pa.Table.from_pandas(g.assign(__bucket=b), preserve_index=False)

    df_tbl = (
        tf_ds.map_batches(df_partial, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(
            lambda g: g.groupby("term", as_index=False)["df"].sum(),
            batch_format="pandas",
        )
        .to_pandas()  # vocabulary-sized (see docstring)
    )
    df_ref = ray.put(df_tbl)

    def score(t: pa.Table) -> pa.Table:
        g = t.to_pandas()
        if g.empty:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "term": pa.array([], pa.string()),
                             "score": pa.array([], pa.float64())})
        from .join import _bcast_get  # per-worker cache: one get per worker

        g = g.merge(_bcast_get(df_ref), on="term", how="left")
        g["score"] = g["tf"].to_numpy(np.float64) * (
            np.log(float(n_docs) / g["df"].to_numpy(np.float64))
        )
        out = g[["doc_id", "term", "score"]]
        return pa.Table.from_pandas(out, preserve_index=False)

    scored = tf_ds.map_batches(score, batch_format="pyarrow")
    # per-doc top-k through the bucketed rank operator: a doc's tf rows
    # can straddle an output-block split (Ray slices >128 MB outputs at
    # arbitrary row offsets), so a per-batch top-k could emit >k rows
    from .sampling import per_key_topn

    ranked = per_key_topn(scored, "doc_id", "score", k, tie_col="term")
    return ranked.map_batches(
        lambda t: t.select(["doc_id", "term", "score"]), batch_format="pyarrow"
    )


def bm25_score(ds, query_terms, text_col: str = "text",
               id_col: str = "doc_id", k1: float = 1.2, b: float = 0.75):
    """BM25 relevance of every document against a fixed term set
    (Robertson/Okapi, the +1 idf variant): returns ``(doc_id, score)``
    for documents matching at least one query term.

    score(d) = Σ_t idf(t) · tf · (k1+1) / (tf + k1·(1−b + b·len(d)/avgdl)),
    idf(t) = ln((N − df + 0.5)/(df + 0.5) + 1); tokens are lower(text)
    split on ``[^a-z]+`` (the tfidf/oracle convention).

    Shape: a document lives in ONE row, so there is NO shuffle anywhere —
    (1) one tokenize-and-count pass emits the narrow per-doc partials
    (len, tf per query term); (2) a scalar fold over per-block summaries
    yields N / total-length / per-term df; (3) scoring is a stateless
    map with the scalars closed over.  Query terms are a handful, so tf
    counting uses one compiled zero-width-boundary regex per term.

    Bit-exactness contract with the SQL oracle: every float op mirrors
    the SQL expression's parse tree — (idf·tf)·(k1+1) / (tf + k1·((1−b)
    + (b·len)/avgdl)), per-term contributions added left-to-right in
    query_terms order, and composite constants are computed (k1 + 1.0),
    never folded literals (1.2 + 1.0 and the literal 2.2 differ at the
    final ulp).
    """
    import math
    import re as _re

    terms = [str(t) for t in query_terms]
    pats = [rf"(?<![a-z]){_re.escape(t)}(?![a-z])" for t in terms]

    def per_doc(t: pa.Table) -> pa.Table:
        s = pd.Series(t[text_col].to_pylist(), dtype=object).fillna("").str.lower()
        cols = {"doc_id": t[id_col].to_numpy(zero_copy_only=False),
                "len": s.str.count(r"[a-z]+").to_numpy(np.int64)}
        for j, p in enumerate(pats):
            cols[f"tf{j}"] = s.str.count(p).to_numpy(np.int64)
        return pa.table(cols)

    pdoc = ds.map_batches(per_doc, batch_format="pyarrow").materialize()

    def summary(t: pa.Table) -> pa.Table:
        import pyarrow.compute as _c
        out = {"n": pa.array([t.num_rows], pa.int64()),
               "tot": pa.array([int(_c.sum(t["len"]).as_py() or 0)], pa.int64())}
        for j in range(len(terms)):
            nz = _c.sum(_c.cast(_c.greater(t[f"tf{j}"], 0), pa.int64())).as_py()
            out[f"df{j}"] = pa.array([int(nz or 0)], pa.int64())
        return pa.table(out)

    rows = pdoc.map_batches(summary, batch_format="pyarrow").take_all()
    n = sum(r["n"] for r in rows)
    if n == 0:
        import ray.data as rd
        return rd.from_arrow(pa.table({"doc_id": pa.array([], pa.int64()),
                                       "score": pa.array([], pa.float64())}))
    tot = sum(r["tot"] for r in rows)
    dfs = [sum(r[f"df{j}"] for r in rows) for j in range(len(terms))]
    avgdl = float(tot) / float(n)
    idf = [math.log(((n - df) + 0.5) / (df + 0.5) + 1.0) for df in dfs]
    k1 = float(k1)
    bb = float(b)
    k1p1 = k1 + 1.0
    one_minus_b = 1.0 - bb

    def score(t: pa.Table) -> pa.Table:
        lenf = t["len"].to_numpy(zero_copy_only=False).astype(np.float64)
        dnorm = k1 * (one_minus_b + (bb * lenf) / avgdl)
        total = np.zeros(t.num_rows, dtype=np.float64)
        any_hit = np.zeros(t.num_rows, dtype=bool)
        for j in range(len(terms)):
            tf = t[f"tf{j}"].to_numpy(zero_copy_only=False).astype(np.float64)
            total = total + ((idf[j] * tf) * k1p1) / (tf + dnorm)
            any_hit |= tf > 0.0
        return pa.table({"doc_id": t["doc_id"].to_numpy(zero_copy_only=False)[any_hit],
                         "score": total[any_hit]})

    return pdoc.map_batches(score, batch_format="pyarrow")


# ------------------------------------------------------- char-bigram LM
def _byte_pairs(texts):
    """Flat byte-pair ids for a batch: encode the column to ONE UTF-8
    buffer (Arrow's string layout is exactly that), form every
    consecutive-byte pair id ``b[i]*256 + b[i+1]``, and drop pairs that
    straddle a document boundary by offset arithmetic — no per-doc loop.

    Returns ``(pair_ids, doc_starts, n_pairs)``: concatenated per-doc
    pair runs in document order, each doc's start offset into that flat
    array, and its pair count (``max(len_bytes - 1, 0)``).
    """
    norm = pd.Series(texts, dtype=object).fillna("")
    arr = pa.array(norm.to_numpy(dtype=object), pa.string())
    n = len(arr)
    if n == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64), np.empty(0, np.int64)
    offsets = np.frombuffer(arr.buffers()[1], dtype=np.int32)[: n + 1].astype(np.int64)
    data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)[: offsets[-1]]
    if len(data) < 2:
        z = np.zeros(n, np.int64)
        return np.empty(0, np.int64), z, z
    pairs = data[:-1].astype(np.int64) * 256 + data[1:]
    valid = np.ones(len(pairs), dtype=bool)
    bnd = offsets[1:-1]                       # interior doc starts
    idx = bnd - 1                             # pair spanning the boundary
    valid[idx[(idx >= 0) & (idx < len(valid))]] = False
    lengths = np.diff(offsets)
    n_pairs = np.maximum(lengths - 1, 0)
    doc_starts = np.zeros(n, dtype=np.int64)
    np.cumsum(n_pairs[:-1], out=doc_starts[1:])
    return pairs[valid], doc_starts, n_pairs


def train_char_lm(ds, text_col: str = "text", alpha: float = 0.5) -> np.ndarray:
    """Train a byte-bigram language model over a corpus → 256×256
    float64 ``log2 P(next | prev)`` matrix (add-``alpha`` smoothing).

    The CCNet-style quality-model step, distributed: each batch reduces
    to ONE ``bincount(65536)`` partial and emits only its nonzero
    ``(pair_id, n)`` rows; a single bucketed sum (the repo's standard
    partial/combine grouped aggregate) merges them, and the ≤65 536-row
    result is driver-built into the matrix — counts are additive, so
    the model is bit-identical under any partitioning or resume.
    """
    from .windows import AggSpec, grouped_aggregate

    def partial(t: pa.Table) -> pa.Table:
        pairs, _, _ = _byte_pairs(t[text_col].to_pylist())
        counts = np.bincount(pairs, minlength=65536)
        nz = np.flatnonzero(counts)
        return pa.table({
            "pair_id": pa.array(nz.astype(np.int64)),
            "n": pa.array(counts[nz].astype(np.int64)),
        })

    merged = grouped_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["pair_id"], [AggSpec("sum", "n", "n")],
    ).to_pandas()                             # bounded: ≤65 536 rows
    counts = np.zeros(65536, dtype=np.float64)
    counts[merged["pair_id"].to_numpy()] = merged["n"].to_numpy()
    counts = counts.reshape(256, 256)
    row_tot = counts.sum(axis=1, keepdims=True)
    return np.log2((counts + alpha) / (row_tot + 256.0 * alpha))


class LmScore:
    """Score documents against a broadcast byte-bigram LM: bits/byte
    cross-entropy ``-(Σ log2 P(pairs)) / n_pairs`` (the perplexity
    quality filter; low = in-domain, high = noise/out-of-language).

    Holds a ``ray.put`` ObjectRef and materializes the 512 KB matrix
    lazily per worker (zero-copy plasma read) — the broadcast-small-side
    pattern, never re-shipped per batch.  Documents under 2 bytes score
    NULL.  Per-doc sums use one ``add.reduceat`` over the batch's flat
    pair run — sequential within each doc segment, so the score is
    independent of batch composition.
    """

    def __init__(self, model_ref, text_col: str = "text",
                 out_col: str = "bits_per_byte"):
        self._ref = model_ref
        self._logp = None
        self.text_col = text_col
        self.out_col = out_col

    def __call__(self, t: pa.Table) -> pa.Table:
        if self._logp is None:
            import ray

            self._logp = (ray.get(self._ref)
                          if not isinstance(self._ref, np.ndarray) else self._ref)
        logp = self._logp.reshape(-1)
        pairs, doc_starts, n_pairs = _byte_pairs(t[self.text_col].to_pylist())
        bits = np.full(t.num_rows, np.nan)
        has = n_pairs > 0
        if len(pairs) and has.any():
            # reduceat over non-empty docs only: zero-pair docs repeat the
            # next doc's start and would corrupt segment boundaries
            sums = np.add.reduceat(logp[pairs], doc_starts[has])
            bits[has] = -sums / n_pairs[has]
        return t.append_column(self.out_col, pa.array(bits, from_pandas=True))


def levenshtein_probe(texts, probe: str, prefix_chars: int = 0) -> np.ndarray:
    """Levenshtein distance of every text (optionally its first
    ``prefix_chars`` characters) to ONE probe string, vectorized ACROSS
    the batch: the classic DP runs its (text_len × probe_len) cell loop
    once, with every cell update a numpy op over ALL rows at that cell —
    the per-doc Python loop becomes an O(L·m) loop of O(n) vector ops.

    The fuzzy-match verification kernel for candidate pairs (edit
    distance is what LSH candidates get verified WITH); as a corpus
    probe it is the streaming analogue of ``ngram_overlap_probe``.
    DuckDB ``levenshtein`` parity (character-level, case-sensitive)."""
    s = pd.Series(texts, dtype=object).fillna("")
    if prefix_chars:
        s = s.str.slice(0, prefix_chars)
    n = len(s)
    m = len(probe)
    lens = s.str.len().to_numpy(dtype=np.int64)
    if n == 0:
        return np.empty(0, np.int64)
    if m == 0:
        return lens.copy()
    L = int(lens.max()) if n else 0
    # (n, L) code-point matrix via the utf-32 encoding, padded with -1
    # (never equals a probe char)
    enc = s.str.ljust(L, "\x00").to_numpy(dtype=object)
    mat = np.frombuffer("".join(enc).encode("utf-32-le"), dtype=np.uint32)
    mat = mat.reshape(n, L).astype(np.int64)
    mat[np.arange(L)[None, :] >= lens[:, None]] = -1
    pr = np.array([ord(c) for c in probe], dtype=np.int64)

    # dp over probe dimension, advanced one text char at a time
    dp = np.broadcast_to(np.arange(m + 1, dtype=np.int64),
                         (n, m + 1)).copy()
    out = np.where(lens == 0, m, 0).astype(np.int64)
    done0 = lens == 0
    for i in range(L):
        prev = dp
        dp = np.empty_like(prev)
        dp[:, 0] = i + 1
        ci = mat[:, i]
        # substitution/match and deletion terms vectorize over j; the
        # insertion term (left neighbor) is the sequential part — one
        # O(n) op per probe position
        sub = prev[:, :-1] + (ci[:, None] != pr[None, :])
        dele = prev[:, 1:] + 1
        best = np.minimum(sub, dele)
        for j in range(1, m + 1):
            np.minimum(best[:, j - 1], dp[:, j - 1] + 1, out=dp[:, j])
        fin = lens == i + 1
        if fin.any():
            out[fin] = dp[fin, m]
    return np.where(done0, m, out)



def hash_embed(ds, text_col: str = "text", id_col: str = "doc_id",
               dim: int = 256, seed: int = 7):
    """Feature-hashing (hashing-trick) document embeddings — the text→
    vector front door for the kmeans / ANN / PCA / SemDeDup tier
    (Weinberger et al. 2009, "Feature Hashing for Large Scale Multitask
    Learning").

    Tokenization is ``lower(text)`` split on ``[^a-z]+`` (the tfidf
    convention).  Each token hashes once (vectorized ``hash64`` mixed
    with an odd seed multiplier); coordinate = ``h % dim``, sign = top
    hash bit — the signed variant whose collisions cancel in
    expectation.  All tokens of a batch accumulate through ONE
    ``np.bincount`` over ``row·dim + coord``; vectors L2-normalize
    (all-empty doc → zero vector).  Pure per-batch map, NO shuffle;
    output schema matches the ``embeddings`` table (id,
    ``list<float32>``) so every downstream embedding operator composes
    unchanged.  Deterministic and partition/resume-invariant: the
    vector is a pure function of the document text.
    """
    import pyarrow.compute as pc

    from ..hashing import hash64

    mul = np.uint64(((2 * seed + 1) * 0x9E3779B97F4A7C15) % (1 << 64))

    def embed(t: pa.Table) -> pa.Table:
        n_rows = t.num_rows
        toks = pc.split_pattern_regex(
            pc.utf8_lower(pc.coalesce(t[text_col].combine_chunks(), "")),
            "[^a-z]+")
        flat = toks.values.to_numpy(zero_copy_only=False)
        offsets = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        row = np.repeat(np.arange(n_rows, dtype=np.int64),
                        np.diff(offsets))
        keep = np.flatnonzero(flat != "")
        acc = np.zeros(n_rows * dim, np.float64)
        if len(keep):
            h = hash64(flat[keep]) * mul
            coord = (h % np.uint64(dim)).astype(np.int64)
            sign = np.where((h >> np.uint64(63)).astype(bool), 1.0, -1.0)
            acc = np.bincount(row[keep] * dim + coord, weights=sign,
                              minlength=n_rows * dim)
        mat = acc.reshape(n_rows, dim)
        norms = np.sqrt((mat * mat).sum(axis=1, keepdims=True))
        np.divide(mat, norms, out=mat, where=norms > 0)
        vals = pa.array(mat.astype(np.float32).ravel(), pa.float32())
        offs = pa.array(
            np.arange(0, (n_rows + 1) * dim, dim, dtype=np.int32))
        return pa.table({
            id_col: t[id_col],
            "embedding": pa.ListArray.from_arrays(offs, vals),
        })

    return ds.map_batches(embed, batch_format="pyarrow")
