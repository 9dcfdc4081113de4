"""End-to-end corpus curation: the training-data preparation pipeline
composed from the catalog's operators, in the order a real pretraining
corpus build runs them:

1. exact dedup        — one survivor per distinct normalized text
                        (`dedup.exact_dedup`);
2. language ID        — per-doc predicted language (`text.LangId`);
3. quality filters    — stopword/punct/repetition thresholds
                        (`text.QualityScore`, `text.repetition_stats`
                        signals computed in the SAME per-batch pass);
4. token budget       — per language, best-quality docs first until a
                        token allowance is spent (`sampling.budget_cap`);
5. sequence packing   — greedy first-fit into fixed-token training
                        sequences (`sampling.pack_sequences`).

Every stage is a per-batch map or a single hash-bucket exchange (the
budget cap and the packer) — the whole pipeline streams; nothing
materializes on the driver.  Filters drop DETERMINISTICALLY (pure
functions of the row), so the output is partition/resume-invariant like
every operator it composes.

The stage-count report (`counts=True`) triggers one extra `count()`
execution per stage — diagnostic runs only; production runs stream
straight to the packer.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

__all__ = ["curation_pipeline", "CurationConfig"]

from dataclasses import dataclass


@dataclass
class CurationConfig:
    min_stopword_ratio: float = 0.02   # below: likely non-language junk
    max_punct_ratio: float = 0.30
    max_dup_token_frac: float = 0.40   # Gopher-style repetition cut
    min_tokens: int = 8
    token_budget_per_lang: int = 50_000
    pack_tokens: int = 512


def curation_pipeline(docs, cfg: CurationConfig | None = None,
                      text_col: str = "text", id_col: str = "doc_id",
                      counts: bool = False):
    """``docs`` (Dataset with id + text) → packed training sequences.

    Returns ``(packs, stage_counts)``: packs carry every surviving doc
    row plus ``lang_pred``, ``n_tokens``, ``pack_id``, ``pack_pos``,
    ``pack_tokens``; ``stage_counts`` is ``None`` unless ``counts``.
    """
    from ..stages.dedup import exact_dedup
    from ..stages.sampling import budget_cap, pack_sequences
    from ..stages.text import LangId, QualityScore

    cfg = cfg or CurationConfig()
    stage_counts: dict[str, int] | None = {} if counts else None

    def note(name, ds):
        if stage_counts is not None:
            stage_counts[name] = ds.count()
        return ds

    note("input", docs)
    deduped = note("dedup", exact_dedup(docs, [text_col], id_col))

    scored = deduped.map_batches(LangId(text_col), batch_format="pandas") \
                    .map_batches(QualityScore(text_col, lang_col="lang_pred"),
                                 batch_format="pandas")

    def filters(df: pd.DataFrame) -> pd.DataFrame:
        s = df[text_col].fillna("")
        toks = s.str.split()
        n_tokens = toks.str.len().fillna(0).astype("int64")
        nuniq = toks.explode().groupby(level=0).nunique()
        dup_frac = (
            1.0 - nuniq.reindex(df.index).fillna(1)
            / n_tokens.clip(lower=1)
        ).to_numpy()
        keep = (
            (df["stopword_ratio"] >= cfg.min_stopword_ratio)
            & (df["punct_ratio"] <= cfg.max_punct_ratio)
            & (dup_frac <= cfg.max_dup_token_frac)
            & (n_tokens >= cfg.min_tokens)
        )
        out = df.loc[keep, [id_col, text_col, "lang_pred", "quality_score"]]
        out["n_tokens"] = n_tokens[keep]
        return out

    filtered = note("quality", scored.map_batches(filters, batch_format="pandas"))

    budgeted = note("budget", budget_cap(
        filtered, "lang_pred", "quality_score", id_col,
        "n_tokens", cfg.token_budget_per_lang,
    ))

    packs = pack_sequences(budgeted, id_col, "n_tokens", cfg.pack_tokens)
    note("packed", packs)
    return packs, stage_counts
