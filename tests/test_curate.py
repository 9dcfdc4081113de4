"""End-to-end curation pipeline: stage composition invariants."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from hydra_ray.pipelines.curate import CurationConfig, curation_pipeline


@pytest.fixture(scope="module")
def corpus():
    rng = np.random.default_rng(21)
    stop = ["the", "a", "of", "to", "and"]
    vocab = ["model", "data", "training", "signal", "filter", "quality",
             "corpus", "token", "stream", "batch"]
    docs = {}
    for i in range(80):
        n = int(rng.integers(12, 60))
        words = [
            str(rng.choice(stop)) if rng.random() < 0.3 else str(rng.choice(vocab))
            for _ in range(n)
        ]
        docs[i] = " ".join(words)
    docs[100] = docs[7]                       # exact duplicate → deduped
    docs[101] = "spam " * 40                  # degenerate repetition → cut
    docs[102] = "short text"                  # < min_tokens → cut
    docs[103] = "!!! ??? ;;; ::: !!! ??? " * 5  # punct junk → cut
    return docs


def test_curation_pipeline_stages_and_packing(ray_session, corpus):
    df = pd.DataFrame({"doc_id": list(corpus), "text": list(corpus.values())})
    cfg = CurationConfig(token_budget_per_lang=1_000, pack_tokens=128)
    packs, counts = curation_pipeline(
        rd.from_pandas(df).repartition(4), cfg, counts=True)
    out = packs.to_pandas()

    # stage counts are monotone non-increasing and every filter fired
    assert counts["input"] == len(df)
    assert counts["dedup"] == len(df) - 1          # planted exact dup
    assert counts["quality"] < counts["dedup"]
    assert counts["budget"] <= counts["quality"]
    assert counts["packed"] == counts["budget"]
    for bad in (101, 102, 103):
        assert bad not in set(out["doc_id"])
    assert not {7, 100} <= set(out["doc_id"])      # one survivor of the pair

    # packing invariants: per-pack sums consistent and within budget
    g = out.groupby("pack_id")
    assert (g["n_tokens"].sum() == g["pack_tokens"].first()).all()
    assert (g["pack_tokens"].first() <= cfg.pack_tokens).all()
    # per-language token budget respected
    assert (out.groupby("lang_pred")["n_tokens"].sum()
            <= cfg.token_budget_per_lang).all()

    # deterministic under repartitioning
    packs2, _ = curation_pipeline(rd.from_pandas(df).repartition(1), cfg)
    out2 = packs2.to_pandas()
    a = out.sort_values("doc_id").reset_index(drop=True)
    b = out2.sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        a[["doc_id", "lang_pred", "n_tokens", "pack_id", "pack_pos"]],
        b[["doc_id", "lang_pred", "n_tokens", "pack_id", "pack_pos"]],
    )
