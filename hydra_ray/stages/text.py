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

__all__ = ["TokenStats", "QualityScore", "LangId", "Fingerprint"]

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
        batch["n_tokens"] = (s.str.count(r"\s+") + (s.str.len() > 0).astype(int)).astype("int64")
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
        self.word_re = re.compile(r"[a-zA-Z']+")

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        s = batch[self.text_col].fillna("")
        n = s.str.len().clip(lower=1)
        batch["punct_ratio"] = (s.str.count(r"[^\w\s]") / n).astype("float64")
        words = s.str.findall(self.word_re)
        n_words = words.map(len).clip(lower=1)
        batch["mean_word_len"] = words.map(lambda ws: float(np.mean([len(w) for w in ws])) if ws else 0.0)
        langs = (
            batch[self.lang_col]
            if self.lang_col and self.lang_col in batch
            else pd.Series(["en"] * len(batch), index=batch.index)
        )
        stop_hits = [
            sum(1 for w in ws if w.lower() in _STOPWORDS.get(lg, _STOPWORDS["en"]))
            for ws, lg in zip(words, langs)
        ]
        batch["stopword_ratio"] = (np.array(stop_hits) / n_words.to_numpy()).astype("float64")
        uniq = words.map(lambda ws: len(set(ws)) if ws else 0)
        batch["repetition_ratio"] = (1.0 - uniq / n_words).astype("float64")
        batch["quality_score"] = (
            0.4 * (1.0 - batch["repetition_ratio"])
            + 0.3 * (1.0 - batch["punct_ratio"].clip(0, 1))
            + 0.3 * batch["stopword_ratio"].clip(0, 0.6) / 0.6
        ).astype("float64")
        return batch


class LangId:
    """Character n-gram language heuristic over a tiny built-in profile.

    A deterministic stand-in for fastText-style LID: scores each doc
    against per-language trigram profiles built from the stopword tables
    (the real model would load in ``__init__`` the same way — once per
    actor)."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        self.profiles = {
            lang: {w: 1.0 for w in words} for lang, words in _STOPWORDS.items()
        }
        self.word_re = re.compile(r"[a-zA-Zäöüßéèàçñ']+")

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        texts = batch[self.text_col].fillna("")
        langs, scores = [], []
        for t in texts:
            ws = [w.lower() for w in self.word_re.findall(t)]
            if not ws:
                langs.append("und")
                scores.append(0.0)
                continue
            best_lang, best = "und", 0.0
            for lang, prof in self.profiles.items():
                hit = sum(1 for w in ws if w in prof) / len(ws)
                if hit > best:
                    best_lang, best = lang, hit
            langs.append(best_lang if best > 0.0 else "und")
            scores.append(float(best))
        batch["lang_pred"] = langs
        batch["lang_score"] = scores
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
