"""Direct unit tests for batch join/dedup operators (edges not covered by
the oracle-parity harness)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from hydra_ray.stages.dedup import exact_dedup, latest_by_key
from hydra_ray.stages.join import broadcast_join, interval_join, keyed_join


@pytest.fixture()
def rd(ray_session):
    import ray.data as rd

    return rd


def test_keyed_join_inner(rd):
    left = rd.from_items([{"k": 1, "a": "x"}, {"k": 2, "a": "y"}, {"k": 3, "a": "z"}])
    right = rd.from_items([{"k": 2, "b": 20.0}, {"k": 3, "b": 30.0}, {"k": 4, "b": 40.0}])
    out = keyed_join(left, right, "k").to_pandas().sort_values("k")
    assert out["k"].tolist() == [2, 3]
    assert out["b"].tolist() == [20.0, 30.0]


def test_keyed_join_left_outer(rd):
    left = rd.from_items([{"k": 1, "a": "x"}, {"k": 2, "a": "y"}])
    right = rd.from_items([{"k": 2, "b": 20.0}])
    out = keyed_join(left, right, "k", how="left").to_pandas().sort_values("k")
    assert len(out) == 2
    assert pd.isna(out[out["k"] == 1]["b"]).all()


def test_broadcast_join_types(rd):
    ds = rd.from_items([{"k": i % 3, "v": i} for i in range(30)])
    side = pd.DataFrame({"k": [0, 1], "name": ["zero", "one"]})
    out = broadcast_join(ds, side, on="k").to_pandas()
    assert len(out) == 20  # k==2 rows dropped (inner)
    assert set(out["name"]) == {"zero", "one"}


def test_interval_join_bounds(rd):
    import numpy as np

    left = rd.from_items([{"k": "a", "ts": 1000, "lid": 1}])
    right = rd.from_items(
        [
            {"k": "a", "ts": 999, "rid": 1},   # before: excluded (lo=0)
            {"k": "a", "ts": 1000, "rid": 2},  # inclusive lower bound
            {"k": "a", "ts": 1999, "rid": 3},  # inside
            {"k": "a", "ts": 2000, "rid": 4},  # exclusive upper bound
            {"k": "b", "ts": 1500, "rid": 5},  # wrong key
        ]
    )
    out = interval_join(
        left, right, "k", "ts", "ts", 0, 1000, ["lid"], ["rid"]
    ).to_pandas()
    assert sorted(out["rid"].tolist()) == [2, 3]


def test_latest_by_key_tombstone_drop(rd):
    ds = rd.from_items(
        [
            {"k": "a", "ts": 1, "v": "v1"},
            {"k": "a", "ts": 2, "v": None},   # tombstone wins, then dropped
            {"k": "b", "ts": 1, "v": "w1"},
            {"k": "b", "ts": 3, "v": "w3"},
        ]
    )
    out = latest_by_key(ds, ["k"], ["ts"], drop_nulls_in="v").to_pandas()
    assert out["k"].tolist() == ["b"]
    assert out["v"].tolist() == ["w3"]


def test_exact_dedup_all_unique(rd):
    ds = rd.from_items([{"doc_id": i, "text": f"t{i}"} for i in range(10)])
    out = exact_dedup(ds, ["text"], "doc_id").to_pandas()
    assert len(out) == 10
    assert (out["n_copies"] == 1).all()


def test_exact_dedup_survivor_is_min(rd):
    ds = rd.from_items(
        [{"doc_id": i, "text": "same" if i % 2 else f"u{i}"} for i in range(10)]
    )
    out = exact_dedup(ds, ["text"], "doc_id").to_pandas()
    dupe = out[out["n_copies"] > 1]
    assert dupe["doc_id"].tolist() == [1]  # min doc_id among 1,3,5,7,9
    assert dupe["n_copies"].tolist() == [5]


def test_bucketed_join_inner_and_left(rd):
    from hydra_ray.stages.join import bucketed_join

    left = rd.from_items([{"k": i, "a": f"x{i}"} for i in range(50)])
    right = rd.from_items([{"k": i * 2, "b": float(i)} for i in range(50)])
    out = bucketed_join(left, right, "k", num_buckets=7).to_pandas()
    # inner: even keys 0..48 present exactly once
    assert sorted(out["k"].tolist()) == list(range(0, 50, 2))
    assert out["a"].notna().all() and out["b"].notna().all()
    lo = bucketed_join(left, right, "k", how="left", num_buckets=7).to_pandas()
    assert len(lo) == 50
    assert lo["b"].isna().sum() == 25  # odd keys unmatched


def test_bucketed_join_rejects_shared_columns(rd):
    from hydra_ray.stages.join import bucketed_join

    left = rd.from_items([{"k": 1, "x": 1}])
    right = rd.from_items([{"k": 1, "x": 2}])
    import pytest as _pytest

    with _pytest.raises(ValueError, match="shared"):
        bucketed_join(left, right, "k")


def test_asof_join_matches_bruteforce(rd):
    """Backward as-of vs a per-row brute force: ties on ts break to the
    greatest tie_col; unmatched left rows drop; tolerance bounds the gap.
    Randomized keys/ts across blocks so bucket routing is exercised."""
    import numpy as np

    from hydra_ray.stages.join import asof_join

    rng = np.random.default_rng(11)
    nl, nr = 400, 300
    lk = rng.integers(0, 12, nl)
    rk = rng.integers(0, 12, nr)
    lts = rng.integers(0, 5_000, nl) * 1000
    rts = rng.integers(0, 5_000, nr) * 1000  # coarse grid forces ts ties
    ldf = pd.DataFrame({"k": lk, "ts": pd.to_datetime(lts, unit="ms"),
                        "lid": np.arange(nl)})
    rdf = pd.DataFrame({"k": rk, "ts": pd.to_datetime(rts, unit="ms"),
                        "rid": np.arange(nr)})

    for tol in (None, 120_000):
        out = (
            asof_join(
                rd.from_pandas(ldf).repartition(5),
                rd.from_pandas(rdf).repartition(4),
                "k", "ts", "ts",
                left_cols=["lid"], right_cols=["rid"],
                tie_col="rid", tolerance_ms=tol,
            )
            .to_pandas()
            .sort_values("lid")
            .reset_index(drop=True)
        )
        expect = {}
        for _, lrow in ldf.iterrows():
            best = None
            for _, rrow in rdf.iterrows():
                if rrow["k"] != lrow["k"] or rrow["ts"] > lrow["ts"]:
                    continue
                gap = (lrow["ts"] - rrow["ts"]).total_seconds() * 1000
                if tol is not None and gap > tol:
                    continue
                cand = (rrow["ts"], rrow["rid"])
                if best is None or cand > best:
                    best = cand
            if best is not None:
                expect[lrow["lid"]] = best[1]
        assert out["lid"].tolist() == sorted(expect)
        got = dict(zip(out["lid"], out["rid"]))
        assert got == expect


def test_hash_split_deterministic_and_fractioned(rd):
    import numpy as np

    from hydra_ray.stages.sampling import hash_split

    ids = pd.DataFrame({"doc_id": np.arange(10_000)})
    out = hash_split(rd.from_pandas(ids).repartition(7), "doc_id",
                     splits=(("train", 0.8), ("val", 0.1), ("test", 0.1)))
    df = out.to_pandas()
    frac = df["split"].value_counts(normalize=True)
    assert abs(frac["train"] - 0.8) < 0.02
    assert abs(frac["val"] - 0.1) < 0.02
    # deterministic: same id -> same split regardless of partitioning
    df2 = hash_split(rd.from_pandas(ids).repartition(2), "doc_id",
                     splits=(("train", 0.8), ("val", 0.1), ("test", 0.1))).to_pandas()
    m = df.merge(df2, on="doc_id")
    assert (m["split_x"] == m["split_y"]).all()
    with pytest.raises(ValueError):
        hash_split(rd.from_pandas(ids), "doc_id", splits=(("a", 0.5), ("b", 0.3)))


def test_per_key_topn_rank_and_ties(rd):
    import numpy as np

    from hydra_ray.stages.sampling import per_key_topn

    df = pd.DataFrame({
        "k": ["a"] * 5 + ["b"] * 2,
        "score": [3, 3, 2, 1, 3, 9, 9],
        "id": [10, 11, 12, 13, 14, 20, 21],
    })
    out = (
        per_key_topn(rd.from_pandas(df).repartition(3), "k", "score", 3, tie_col="id")
        .to_pandas().sort_values("id")
    )
    # a: three score-3 rows win (ids 10,11,14 — ascending id breaks ties
    # BEFORE lower scores); b: both rows kept (cap not binding)
    assert out[out["k"] == "a"]["id"].tolist() == [10, 11, 14]
    assert out[out["k"] == "b"]["id"].tolist() == [20, 21]


def test_bucketed_join_semi_anti(rd):
    from hydra_ray.stages.join import bucketed_join

    left = rd.from_items([{"k": i, "a": i * 10} for i in range(8)])
    right = rd.from_items([{"k": 2}, {"k": 2}, {"k": 5}, {"k": 9}])
    semi = bucketed_join(left, right, "k", how="semi").to_pandas().sort_values("k")
    anti = bucketed_join(left, right, "k", how="anti").to_pandas().sort_values("k")
    assert semi["k"].tolist() == [2, 5]          # left columns only, no dup
    assert list(semi.columns) == ["k", "a"]
    assert anti["k"].tolist() == [0, 1, 3, 4, 6, 7]
    assert anti["a"].tolist() == [0, 10, 30, 40, 60, 70]


def test_per_key_topn_unsigned_order_and_split_guard(rd):
    import numpy as np

    from hydra_ray.stages.sampling import hash_split, per_key_topn

    df = pd.DataFrame({"k": ["a"] * 4, "score": np.array([0, 5, 3, 9], np.uint32),
                       "id": [1, 2, 3, 4]})
    out = per_key_topn(rd.from_pandas(df), "k", "score", 2, tie_col="id").to_pandas()
    assert sorted(out["id"]) == [2, 4]  # largest uint values, not wrapped
    with pytest.raises(Exception):  # negative ids diverge from the SQL oracle
        hash_split(rd.from_pandas(pd.DataFrame({"doc_id": [-2, 1]})),
                   "doc_id").to_pandas()


def test_ivf_index_build_search_recall(rd, tmp_path):
    """Persistent IVF index: pruned-read search reaches >=60% recall@10 of
    the exact top-k at nprobe=4/16 lists, and only probed list dirs are
    ever read (the others' files stay untouched on disk)."""
    import os

    import numpy as np

    from hydra_ray.pipelines.batch_queries import _read
    from hydra_ray.stages.similarity import (
        build_ivf_index,
        cosine_topk,
        ivf_search_index,
    )

    sf = "/root/testdata/sf0.001"
    ds = _read(sf, "embeddings")
    root = str(tmp_path / "ivf")
    build_ivf_index(ds, root, n_centroids=16)
    assert os.path.exists(os.path.join(root, "centroids.parquet"))
    n_lists = sum(1 for d in os.listdir(os.path.join(root, "lists"))
                  if d.startswith("partition="))
    assert n_lists == 16

    import pyarrow.parquet as pq2

    qt = pq2.read_table(os.path.join(sf, "embeddings.parquet"))
    qt = qt.slice(0, 8)
    qids = qt["vec_id"].to_numpy(zero_copy_only=False)
    qmat = np.stack(qt["embedding"].to_numpy(zero_copy_only=False))

    approx = ivf_search_index(root, qids, qmat, k=10, nprobe=4).to_pandas()
    exact = cosine_topk(_read(sf, "embeddings"), qids, qmat, 10).to_pandas()
    recalls = []
    for q in qids:
        a = set(approx[approx["query_id"] == q]["vec_id"])
        e = set(exact[exact["query_id"] == q]["vec_id"])
        recalls.append(len(a & e) / len(e))
    assert np.mean(recalls) >= 0.6, recalls
    # every query's own vector lives in its nearest list -> always found
    for q in qids:
        top1 = approx[approx["query_id"] == q].sort_values("rank").iloc[0]
        assert top1["vec_id"] == q and top1["cosine"] > 0.999


# ------------------------------------------------- frequent items (MG sketch)


def test_frequent_items_exact_regime(rd):
    """capacity ≥ per-block distinct keys → no decrements, exact counts."""
    import numpy as np

    from hydra_ray.stages.sketches import frequent_items

    rng = np.random.default_rng(11)
    keys = rng.integers(0, 40, size=5000)
    df = pd.DataFrame({"k": keys})
    out = (
        frequent_items(rd.from_pandas(df).repartition(7), ["k"], capacity=1024)
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    truth = df.groupby("k").size().sort_index()
    assert out["k"].tolist() == truth.index.tolist()
    assert out["count_lo"].tolist() == truth.tolist()
    assert (out["count_lo"] == out["count_hi"]).all()


def test_frequent_items_bounds(rd):
    """Small capacity over skewed keys: lower/upper bounds bracket the
    truth, the error budget respects N/(capacity+1), and every key more
    frequent than the budget is guaranteed present."""
    import numpy as np

    from hydra_ray.stages.sketches import frequent_items

    rng = np.random.default_rng(7)
    # zipf-ish: a few heavy keys over a long uniform tail
    heavy = np.repeat(np.arange(5), 800)
    tail = rng.integers(100, 3000, size=4000)
    keys = rng.permutation(np.concatenate([heavy, tail]))
    df = pd.DataFrame({"k": keys})
    n = len(df)
    capacity = 64
    out = frequent_items(
        rd.from_pandas(df).repartition(8), ["k"], capacity=capacity
    ).to_pandas()
    truth = df.groupby("k").size()
    budget = n / (capacity + 1)
    err = (out["count_hi"] - out["count_lo"]).iloc[0]
    assert (out["count_hi"] - out["count_lo"] == err).all()  # global Σcuts
    assert err <= budget
    got = out.set_index("k")
    for k, cnt in truth.items():
        if k in got.index:
            assert got.loc[k, "count_lo"] <= cnt <= got.loc[k, "count_hi"]
        else:
            assert cnt <= err  # only keys under the realized error may drop
    for k in truth[truth > budget].index:
        assert k in got.index


def test_stratified_sample_rates_nesting_determinism(rd):
    import numpy as np

    from hydra_ray.stages.sampling import stratified_sample

    rng = np.random.default_rng(3)
    df = pd.DataFrame(
        {"doc_id": np.arange(12_000),
         "lang": rng.choice(["en", "de", "zh"], size=12_000)}
    )
    half = stratified_sample(
        rd.from_pandas(df).repartition(6), "lang", "doc_id",
        {"en": 0.5, "de": 0.25}, default=0.0,
    ).to_pandas()
    rates = half.groupby("lang").size() / df.groupby("lang").size()
    assert abs(rates["en"] - 0.5) < 0.03
    assert abs(rates["de"] - 0.25) < 0.03
    assert "zh" not in half["lang"].values  # default 0.0 drops the stratum
    # nesting: the 0.25-en sample is a subset of the 0.5-en sample
    quarter = stratified_sample(
        rd.from_pandas(df).repartition(2), "lang", "doc_id",
        {"en": 0.25}, default=0.0,
    ).to_pandas()
    q_en = set(quarter.loc[quarter["lang"] == "en", "doc_id"])
    h_en = set(half.loc[half["lang"] == "en", "doc_id"])
    assert q_en <= h_en and len(q_en) > 0


def test_top_ngrams_matches_bruteforce(rd):
    from collections import Counter

    from hydra_ray.stages.text import top_ngrams

    docs = [
        "a b c a b",       # bigrams: a b, b c, c a, a b
        "b c",             # b c
        "a",               # too short: none
        "",                # none
        None,              # none
        "c a b c",         # c a, a b, b c
    ]
    for n in (2, 3):
        truth = Counter()
        for d in docs:
            toks = (d or "").split(" ")
            for i in range(len(toks) - n + 1):
                truth[" ".join(toks[i:i + n])] += 1
        want = sorted(truth.items(), key=lambda kv: (-kv[1], kv[0]))[:4]
        ds = rd.from_arrow(pa.table({"text": pa.array(docs, pa.string())}))
        got = top_ngrams(ds.repartition(3), "text", n=n, k=4).to_pandas()
        assert list(map(tuple, got[["ngram", "n"]].to_numpy())) == want


def test_explode_tokens_and_repetition_stats(rd):
    from collections import Counter

    from hydra_ray.stages.text import explode_tokens, repetition_stats

    docs = ["a b  c a", "  x ", "y y y y", "a"]
    ids = [10, 11, 12, 13]
    ds = rd.from_arrow(pa.table({"doc_id": ids, "text": docs})).repartition(2)

    got = explode_tokens(ds).to_pandas().sort_values(["doc_id", "token"])
    want = [(i, t) for i, d in zip(ids, docs) for t in d.split()]
    assert sorted(map(tuple, got.to_numpy())) == sorted(want)

    st = repetition_stats(ds).to_pandas().set_index("doc_id").sort_index()
    for i, d in zip(ids, docs):
        toks = d.split()
        c = Counter(toks)
        assert st.loc[i, "n_tokens"] == len(toks)
        assert st.loc[i, "n_distinct"] == len(c)
        assert abs(st.loc[i, "dup_token_frac"] - (1 - len(c) / len(toks))) < 1e-12
        assert abs(st.loc[i, "top_token_frac"] - max(c.values()) / len(toks)) < 1e-12


def test_chunk_tokens_windows_and_edges(rd):
    from hydra_ray.stages.text import chunk_tokens

    docs = {
        1: "a b c d e f g h i j",   # 10 toks: exact-multiple case
        2: "a b c d e f g h i j k", # 11 toks: short tail chunk
        3: "x y",                   # shorter than size → itself
        4: "solo",
    }
    ds = rd.from_arrow(pa.table({
        "doc_id": list(docs), "text": list(docs.values())
    })).repartition(2)
    out = (
        chunk_tokens(ds, size=5, stride=5)
        .to_pandas().sort_values(["doc_id", "chunk_idx"]).reset_index(drop=True)
    )

    def ref(text, size=5, stride=5):
        t = text.split()
        nc = max(1, -((len(t) - size) // -stride) + 1)
        return [" ".join(t[i * stride : i * stride + size]) for i in range(nc)]

    for did, text in docs.items():
        got = out[out["doc_id"] == did]["chunk"].tolist()
        assert got == ref(text), (did, got)
    # overlapping stride covers every token at least once
    out2 = chunk_tokens(ds, size=5, stride=3).to_pandas()
    covered = set()
    for _, r in out2[out2["doc_id"] == 2].iterrows():
        covered.update(r["chunk"].split())
    assert covered == set(docs[2].split())


def test_grouped_quantile_linear_matches_numpy(rd):
    import numpy as np

    from hydra_ray.stages.windows import grouped_quantile

    rng = np.random.default_rng(5)
    df = pd.DataFrame({
        "k": rng.integers(0, 7, size=900),
        "v": rng.normal(size=900).round(4),
    })
    out = (
        grouped_quantile(rd.from_pandas(df).repartition(4), ["k"], "v",
                         {"q30": 0.3, "q50": 0.5}, interpolation="linear")
        .to_pandas().set_index("k").sort_index()
    )
    for k, g in df.groupby("k"):
        assert abs(out.loc[k, "q30"] - np.quantile(g["v"], 0.3)) < 1e-12
        assert abs(out.loc[k, "q50"] - np.quantile(g["v"], 0.5)) < 1e-12


def test_pack_sequences_greedy_exact_and_partition_invariant(rd):
    from hydra_ray.hashing import hash64
    from hydra_ray.stages.sampling import pack_sequences

    rng = np.random.default_rng(7)
    n, budget = 800, 1000
    df = pd.DataFrame({
        "doc_id": np.arange(n),
        "w": rng.integers(1, 400, size=n).astype(np.int64),
    })
    df.loc[5, "w"] = 1500  # oversize doc: must land in a pack of its own

    def ref_pack(sub):
        # greedy first-fit in (hash64(id), id) order — the documented rule
        h = hash64(pa.array(sub["doc_id"]))
        order = np.lexsort((sub["doc_id"].to_numpy(), h.astype(np.int64)))
        packs, cur, tot = [], [], 0
        for i in order:
            w = int(sub["w"].iloc[i])
            if cur and tot + w > budget:
                packs.append((cur, tot))
                cur, tot = [], 0
            cur.append(int(sub["doc_id"].iloc[i]))
            tot += w
        if cur:
            packs.append((cur, tot))
        return packs

    outs = []
    for parts in (3, 11):
        out = (
            pack_sequences(rd.from_pandas(df).repartition(parts),
                           "doc_id", "w", budget=budget, num_buckets=8)
            .to_pandas()
        )
        assert len(out) == n
        # invariant: no pack exceeds budget unless it is a single oversize doc
        sizes = out.groupby("pack_id").agg(
            tot=("pack_tokens", "first"), cnt=("doc_id", "count"))
        over = sizes[sizes["tot"] > budget]
        assert (over["cnt"] == 1).all()
        # pack_tokens is consistent with the member weights
        assert (out.groupby("pack_id")["w"].sum()
                == out.groupby("pack_id")["pack_tokens"].first()).all()
        outs.append(out.sort_values("doc_id").reset_index(drop=True))
    # identical assignment at any partitioning
    pd.testing.assert_frame_equal(outs[0], outs[1])

    # exactness vs the reference greedy fold, bucket by bucket
    out = outs[0]
    b = (hash64(pa.array(df["doc_id"])) % np.uint64(8)).astype(np.int64)
    for bucket in range(8):
        sub = df[b == bucket]
        got = (
            out[out["doc_id"].isin(sub["doc_id"])]
            .sort_values(["pack_id", "pack_pos"])
        )
        ref = ref_pack(sub)
        got_packs = [
            (grp["doc_id"].tolist(), int(grp["pack_tokens"].iloc[0]))
            for _, grp in got.groupby("pack_id", sort=True)
        ]
        assert got_packs == ref


def test_redactor_sequential_patterns_and_counts(rd):
    from hydra_ray.stages.text import Redactor

    df = pd.DataFrame(
        {"doc_id": [0, 1, 2],
         "text": ["customer order data", "no hits here", None]}
    )
    out = (
        rd.from_pandas(df)
        .map_batches(
            Redactor([(r"\bcustomer\b", "[R]"), (r"\b(order|data)\b", "[E]")]),
            batch_format="pandas",
        )
        .to_pandas()
        .sort_values("doc_id")
    )
    assert out["text"].tolist() == ["[R] [E] [E]", "no hits here", ""]
    assert out["n_redacted"].tolist() == [3, 0, 0]


def test_bloom_filter_no_false_negatives_and_fpp():
    import numpy as np

    from hydra_ray.stages.bloom import BloomFilter

    rng = np.random.default_rng(11)
    members = rng.integers(0, 1 << 62, size=20_000, dtype=np.uint64)
    others = rng.integers(0, 1 << 62, size=20_000, dtype=np.uint64)
    others = others[~np.isin(others, members)]
    bf = BloomFilter(len(members), fpp=0.01)
    bf.add(members)
    assert bf.contains(members).all()  # no false negatives, ever
    fp = bf.contains(others).mean()
    assert fp < 0.03  # ~1% target with slack
    # union merges per-shard builds
    a, b = BloomFilter(100, 0.01), BloomFilter(100, 0.01)
    a.add(members[:50]); b.add(members[50:100])
    assert a.union(b).contains(members[:100]).all()


def test_bucketed_join_bloom_prefilter_identical(rd):
    import numpy as np

    rng = np.random.default_rng(5)
    left = pd.DataFrame({
        "k": rng.integers(0, 5000, size=8000),
        "a": np.arange(8000),
    })
    right = pd.DataFrame({"k": np.arange(0, 500), "b": np.arange(500) * 1.5})

    def norm(df, cols):
        return df.sort_values(cols).reset_index(drop=True)

    from hydra_ray.stages.join import bucketed_join

    for how in ("inner", "semi", "anti"):
        plain = bucketed_join(
            rd.from_pandas(left).repartition(4),
            rd.from_pandas(right).repartition(2), "k", how=how,
        ).to_pandas()
        bloomed = bucketed_join(
            rd.from_pandas(left).repartition(4),
            rd.from_pandas(right).repartition(2), "k", how=how,
            bloom_fpp=0.01,
        ).to_pandas()
        cols = list(plain.columns)
        pd.testing.assert_frame_equal(
            norm(plain, cols), norm(bloomed, cols), check_dtype=False
        )
    with pytest.raises(ValueError):
        bucketed_join(rd.from_pandas(left), rd.from_pandas(right), "k",
                      how="left", bloom_fpp=0.01)


def test_bottom_k_sample_deterministic_and_accurate(rd):
    import numpy as np

    from hydra_ray.stages.sampling import bottom_k_sample
    from hydra_ray.stages.windows import grouped_quantile

    rng = np.random.default_rng(9)
    n = 30_000
    df = pd.DataFrame({
        "g": rng.choice(["a", "b", "c"], size=n),
        "id": np.arange(n),
        "v": rng.exponential(100.0, size=n),
    })
    s1 = bottom_k_sample(rd.from_pandas(df).repartition(8), "g", "id", 256).to_pandas()
    s2 = bottom_k_sample(rd.from_pandas(df).repartition(3), "g", "id", 256).to_pandas()
    key = lambda d: sorted(map(tuple, d[["g", "id"]].to_numpy()))
    assert key(s1) == key(s2)               # partitioning-independent
    assert (s1.groupby("g").size() == 256).all()
    # uniformity: sample median within a few percent of the true median
    approx = grouped_quantile(
        rd.from_pandas(s1), ["g"], "v", {"p50": 0.5}
    ).to_pandas().set_index("g")["p50"]
    truth = df.groupby("g")["v"].median()
    rel = ((approx - truth).abs() / truth).max()
    assert rel < 0.15, rel


def test_round_f64_matches_duckdb_exactly():
    """round_f64 must reproduce DuckDB's ROUND(double, nd) bit-for-bit —
    the driver's value hash compares exact doubles, and pc.round's
    half_towards_infinity mode diverges (e.g. 6.59 + 0.31 at 2 digits)."""
    import duckdb
    import pyarrow as pa

    from hydra_ray.pipelines.batch_queries import round_f64

    rng = np.random.default_rng(0)
    vals = np.concatenate([
        np.round(rng.uniform(-1000, 1000, 5000), 2)
        + np.round(rng.uniform(-1000, 1000, 5000), 2),   # 2-dp sums (ulp drift)
        rng.uniform(-1, 1, 5000),
        np.array([6.59 + 0.31, 0.125, -0.125, 2.675, -2.675, 0.005, -0.005, 0.0]),
    ])
    con = duckdb.connect()
    con.register("t", pd.DataFrame({"x": vals}))
    for nd in (2, 4, 6):
        mine = round_f64(pa.array(vals, pa.float64()), nd).to_numpy()
        ref = con.execute(f"SELECT round(x, {nd}) FROM t").df().iloc[:, 0].values
        assert (mine == ref).all(), np.flatnonzero(mine != ref)[:5]
    # nulls pass through
    out = round_f64(pa.array([1.005, None], pa.float64()), 2)
    assert out[1].as_py() is None


def test_budget_cap_boundary_and_partition_invariance(rd):
    from hydra_ray.stages.sampling import budget_cap

    rng = np.random.default_rng(5)
    df = pd.DataFrame({
        "k": rng.choice(["a", "b"], size=400),
        "id": np.arange(400),
        "w": rng.integers(1, 50, size=400),
    })
    out = {}
    for parts in (2, 7):
        ds = rd.from_pandas(df).repartition(parts)
        got = budget_cap(ds, "k", "w", "id", "w", budget=500,
                         descending=True).to_pandas()
        out[parts] = got.sort_values(["k", "id"]).reset_index(drop=True)
    assert out[2].equals(out[7])                       # partition-invariant
    got = out[2]
    assert got["running_weight"].dtype == np.int64
    # reference: pandas window semantics, inclusive running sum <= budget
    ref = df.sort_values(["k", "w", "id"], ascending=[True, False, True])
    ref = ref.assign(running_weight=ref.groupby("k")["w"].cumsum())
    ref = ref[ref["running_weight"] <= 500]
    ref = ref.sort_values(["k", "id"]).reset_index(drop=True)
    assert got[["k", "id", "w", "running_weight"]].equals(
        ref[["k", "id", "w", "running_weight"]].astype({"running_weight": "int64"})
    )


def _lm_reference(train_texts, score_texts, alpha=0.5):
    counts = np.zeros((256, 256), dtype=np.float64)
    for s in train_texts:
        b = s.encode("utf-8")
        for i in range(len(b) - 1):
            counts[b[i], b[i + 1]] += 1
    logp = np.log2((counts + alpha) / (counts.sum(1, keepdims=True) + 256 * alpha))
    out = []
    for s in score_texts:
        b = s.encode("utf-8")
        if len(b) < 2:
            out.append(None)
            continue
        tot = 0.0
        for i in range(len(b) - 1):
            tot += logp[b[i], b[i + 1]]
        out.append(-tot / (len(b) - 1))
    return out


def test_char_lm_exact_vs_reference_and_invariant(rd):
    from hydra_ray.stages.text import LmScore, train_char_lm

    train = ["the quick brown fox", "hello world", "the lazy dog", "döner",
             "", "a"]
    score = ["the fox", "", "x", "zzzz qqq", "hello there", "中文文本"]
    model = train_char_lm(rd.from_pandas(pd.DataFrame({"text": train}))
                          .repartition(3), "text")
    ref = _lm_reference(train, score)
    for parts in (1, 4):
        ds = rd.from_pandas(pd.DataFrame({"doc_id": range(len(score)),
                                          "text": score})).repartition(parts)
        got = (ds.map_batches(LmScore(model), batch_format="pyarrow")
                 .to_pandas().sort_values("doc_id")["bits_per_byte"].tolist())
        for g, r in zip(got, ref):
            if r is None:
                assert g is None or np.isnan(g)
            else:
                assert abs(g - r) < 1e-12, (g, r)
    # model itself is partition-invariant (counts are additive)
    model2 = train_char_lm(rd.from_pandas(pd.DataFrame({"text": train}))
                           .repartition(1), "text")
    assert np.array_equal(model, model2)


def test_lm_quality_discriminates_language(ray_session):
    import __ray_entry__ as em

    got = em.queries()["lm_quality"]("/root/testdata/sf0.001").to_pandas()
    m = got.groupby("lang")["bits_per_byte"].mean()
    assert m["en"] < m["zh"], m      # en-trained model prefers en text
    assert m["en"] < m["de"], m


def test_table_diff_statuses_and_null_safety(rd):
    """table_diff emits exactly the divergent keys: added (right-only),
    removed (left-only), changed (any compare col IS DISTINCT FROM),
    with NULL==NULL treated as equal; unchanged keys are omitted."""
    from hydra_ray.stages.diff import table_diff

    ldf = pd.DataFrame({
        "k": [1, 2, 3, 4, 5, 6],
        "v": [10.0, 20.0, np.nan, 40.0, np.nan, 60.0],
        "s": ["a", "b", "c", "d", "e", "f"],
    })
    rdf = pd.DataFrame({
        # 1 unchanged, 2 value drift, 3 NULL==NULL unchanged, 4 dropped,
        # 5 NULL -> value (changed), 7 added
        "k": [1, 2, 3, 5, 6, 7],
        "v": [10.0, 21.0, np.nan, 50.0, 60.0, 70.0],
        "s": ["a", "b", "c", "e", "f", "g"],
    })
    out = (
        table_diff(rd.from_pandas(ldf).repartition(3),
                   rd.from_pandas(rdf).repartition(2), "k", ["v", "s"])
        .to_pandas().sort_values("k").reset_index(drop=True)
    )
    assert out["k"].tolist() == [2, 4, 5, 7]
    assert out["status"].tolist() == ["changed", "removed", "changed", "added"]


def test_table_diff_identical_tables_empty(rd):
    from hydra_ray.stages.diff import table_diff

    df = pd.DataFrame({"k": np.arange(200), "v": np.arange(200) * 1.5})
    out = table_diff(rd.from_pandas(df).repartition(4),
                     rd.from_pandas(df).repartition(7), "k", ["v"])
    assert out.count() == 0


def test_global_rank_matches_argsort(rd):
    """Sample-sort ranks = numpy lexsort ranks: heavy ties (8 distinct
    values over 3000 rows, so every bucket boundary hits a tie class),
    string sort column, and two tiebreak columns."""
    from hydra_ray.stages.sort import global_rank

    rng = np.random.default_rng(7)
    n = 3000
    df = pd.DataFrame({
        "v": rng.choice(list("abcdefgh"), n),
        "t1": rng.integers(0, 50, n),
        "t2": rng.permutation(n),
    })
    out = (
        global_rank(rd.from_pandas(df).repartition(6), "v", ["t1", "t2"],
                    num_buckets=16, sample_per_block=8)
        .to_pandas().sort_values("t2").reset_index(drop=True)
    )
    order = np.lexsort((df["t2"].to_numpy(), df["t1"].to_numpy(),
                        df["v"].to_numpy()))
    ref = np.empty(n, dtype=np.int64)
    ref[order] = np.arange(1, n + 1)
    ref_df = df.assign(rnk=ref).sort_values("t2").reset_index(drop=True)
    assert (out["rnk"].to_numpy() == ref_df["rnk"].to_numpy()).all()


def test_global_rank_rejects_nulls(rd):
    from hydra_ray.stages.sort import global_rank

    df = pd.DataFrame({"v": [1.0, np.nan, 3.0], "id": [1, 2, 3]})
    with pytest.raises(Exception, match="NULL"):
        global_rank(rd.from_pandas(df), "v", ["id"]).count()


def test_compression_ratio_exact_vs_zlib(rd):
    import zlib

    from hydra_ray.stages.text import CompressionRatio

    texts = ["a" * 400, "the quick brown fox jumps over the lazy dog " * 5,
             "", None, "xyz"]
    df = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    out = (
        rd.from_pandas(df).repartition(2)
        .map_batches(CompressionRatio(), batch_format="pyarrow")
        .to_pandas()
        .sort_values("doc_id")
    )
    for t, got in zip(texts, out["compression_ratio"]):
        if not t:
            assert pd.isna(got)
        else:
            raw = t.encode("utf-8")
            assert got == len(zlib.compress(raw, 6)) / len(raw)
    # repetitive text compresses far below prose
    assert out["compression_ratio"].iloc[0] < 0.1 < out["compression_ratio"].iloc[1]


def test_kmeans_lloyd_matches_reference_and_partitioning(rd):
    import numpy as np

    from hydra_ray.hashing import hash64
    from hydra_ray.stages.similarity import kmeans_lloyd

    rng = np.random.default_rng(5)
    k, d, per = 4, 8, 60
    centers = rng.normal(size=(k, d))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    vecs = np.repeat(centers, per, axis=0) + 0.05 * rng.normal(size=(k * per, d))
    ids = np.arange(k * per, dtype=np.int64)
    df = pd.DataFrame({"vec_id": ids, "embedding": list(vecs.astype(np.float32))})

    def reference(iters):
        # mirror the engine's dtype pipeline exactly: float64 normalize,
        # float32 storage in the materialized prep table, float64 math
        x = vecs.astype(np.float32).astype(np.float64)
        x = x / np.linalg.norm(x, axis=1, keepdims=True)
        x = x.astype(np.float32).astype(np.float64)
        order = np.argsort(hash64(ids))[:k]
        c = x[order]  # k smallest hashes, in hash order
        for _ in range(iters):
            sim = x @ c.T
            a = sim.argmax(axis=1)
            new = c.copy()
            for j in range(k):
                m = a == j
                if m.any():
                    v = x[m].mean(axis=0)
                    n = np.linalg.norm(v)
                    if n > 0:
                        new[j] = v / n
            c = new
        # stats from a FINAL assignment against the returned centroids
        # (sizes/inertia describe the returned model — ADVICE r2)
        sim = x @ c.T
        a = sim.argmax(axis=1)
        inertia = float((1.0 - sim[np.arange(len(x)), a]).sum())
        return c, np.bincount(a, minlength=k), inertia

    ref_c, ref_n, ref_i = reference(4)
    for blocks in (1, 6):
        cents, sizes, inertia = kmeans_lloyd(
            rd.from_pandas(df).repartition(blocks), k=k, iters=4)
        assert np.allclose(cents, ref_c, atol=1e-9)
        assert sizes.tolist() == ref_n.tolist()
        assert abs(inertia - ref_i) < 1e-6  # cross-block summation order
    # planted clusters recovered: every cluster non-empty and tight
    assert (sizes > 0).all() and inertia / len(vecs) < 0.05

    # iters=0 is well-defined: seed centroids + stats, no NameError
    c0, n0, i0 = kmeans_lloyd(rd.from_pandas(df), k=k, iters=0)
    ref_c0, ref_n0, ref_i0 = reference(0)
    assert np.allclose(c0, ref_c0, atol=1e-9)
    assert n0.tolist() == ref_n0.tolist()
    assert abs(i0 - ref_i0) < 1e-6


def test_ivf_index_lloyd_training_path(rd, tmp_path):
    """train="lloyd" (distributed whole-corpus k-means) builds a working
    index: same layout, self-recall at nprobe=4."""
    import os

    import numpy as np

    from hydra_ray.pipelines.batch_queries import _read
    from hydra_ray.stages.similarity import build_ivf_index, ivf_search_index

    sf = "/root/testdata/sf0.001"
    root = str(tmp_path / "ivf_lloyd")
    build_ivf_index(_read(sf, "embeddings"), root, n_centroids=8, train="lloyd")
    n_lists = sum(1 for d in os.listdir(os.path.join(root, "lists"))
                  if d.startswith("partition="))
    assert n_lists == 8

    import pyarrow.parquet as pq2

    qt = pq2.read_table(os.path.join(sf, "embeddings.parquet")).slice(0, 6)
    qids = qt["vec_id"].to_numpy(zero_copy_only=False)
    qmat = np.stack(qt["embedding"].to_numpy(zero_copy_only=False))
    got = ivf_search_index(root, qids, qmat, k=5, nprobe=4).to_pandas()
    for q in qids:
        top1 = got[got["query_id"] == q].sort_values("rank").iloc[0]
        assert top1["vec_id"] == q and top1["cosine"] > 0.999


def test_semantic_dedup_recovers_planted_copies(rd):
    import numpy as np

    from hydra_ray.stages.similarity import semantic_dedup

    rng = np.random.default_rng(13)
    k, d, per = 4, 16, 40
    centers = rng.normal(size=(k, d))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    base = np.repeat(centers, per, axis=0) + 0.2 * rng.normal(size=(k * per, d))
    ids = list(range(k * per))
    vecs = list(base)
    # plant near-dup sets: ids 1000+i are copies of i (tiny noise),
    # and 2000..2002 a 3-chain copying id 7
    planted = {}
    for i in (3, 50, 95, 140):
        ids.append(1000 + i)
        vecs.append(base[i] + 1e-4 * rng.normal(size=d))
        planted[1000 + i] = i
    for j in range(3):
        ids.append(2000 + j)
        vecs.append(base[7] + 1e-4 * rng.normal(size=d))
        planted[2000 + j] = 7
    df = pd.DataFrame({"vec_id": np.array(ids, np.int64),
                       "embedding": [v.astype(np.float32) for v in vecs]})

    got = {}
    for blocks in (1, 6):
        out = semantic_dedup(rd.from_pandas(df).repartition(blocks),
                             threshold=0.995, k=k, iters=4).to_pandas()
        m = dict(zip(out["dup_id"], out["keep_id"]))
        if not got:
            got = m
        assert m == got  # partition invariance
    # every planted copy is flagged with its original as keeper
    for dup, orig in planted.items():
        assert got[dup] == orig, (dup, got.get(dup))
    # the base corpus itself is spread-out: few spurious dups
    spurious = {d2 for d2 in got if d2 < 1000}
    assert len(spurious) <= 4, spurious


# ------------------------------------------------- product quantization (ANN)


def test_pq_codes_reconstruct_better_than_random(rd):
    """pq_encode_codes picks nearest subcentroids: reconstruction error is
    far below random code assignment, and codes stay uint8."""
    import numpy as np
    import pyarrow.parquet as pq2

    from hydra_ray.pipelines.batch_queries import _read
    from hydra_ray.stages.similarity import _normalize, pq_encode_codes, train_pq

    sf = "/root/testdata/sf0.001"
    books = train_pq(_read(sf, "embeddings"), m=8, ksub=64, iters=6)
    assert books.shape == (8, 64, 8) and books.dtype == np.float32

    t = pq2.read_table(sf + "/embeddings.parquet").slice(0, 256)
    x = _normalize(np.stack(t["embedding"].to_numpy(zero_copy_only=False)).astype(np.float64))
    codes = pq_encode_codes(x, books)
    assert codes.shape == (256, 8) and codes.dtype == np.uint8
    m, ksub, dsub = books.shape
    rec = np.concatenate([books[j][codes[:, j]] for j in range(m)], axis=1)
    rng = np.random.default_rng(0)
    rnd = np.concatenate([books[j][rng.integers(0, ksub, len(x))] for j in range(m)], axis=1)
    assert ((x - rec) ** 2).mean() < 0.3 * ((x - rnd) ** 2).mean()


def test_pq_topk_recall(rd):
    """ADC + exact-refinement PQ matches the exact top-10 on sf0.001
    (measured 1.0; gate at >=0.9); the pure-ADC path (refine=0) still
    finds each query's own vector at rank 1 and >=40% of the exact set."""
    import numpy as np

    from hydra_ray.pipelines.batch_queries import _load_queries, _read
    from hydra_ray.stages.similarity import cosine_topk, pq_topk, train_pq

    sf = "/root/testdata/sf0.001"
    ids, mat = _load_queries(sf)
    exact = cosine_topk(_read(sf, "embeddings"), ids, mat, 10).to_pandas()
    ds = _read(sf, "embeddings", ["vec_id", "embedding"])
    books = train_pq(ds, m=16, ksub=64, iters=6)

    refined = pq_topk(ds, ids, mat, k=10, books=books, refine=4).to_pandas()
    recalls = []
    for q in ids:
        a = set(refined[refined["query_id"] == q]["vec_id"])
        e = set(exact[exact["query_id"] == q]["vec_id"])
        recalls.append(len(a & e) / len(e))
    assert np.mean(recalls) >= 0.9, recalls
    # refined scores are exact cosines -> top1 is the query itself at ~1.0
    for q in ids:
        top1 = refined[refined["query_id"] == q].sort_values("rank").iloc[0]
        assert top1["vec_id"] == q and top1["score"] > 0.999

    adc = pq_topk(ds, ids, mat, k=10, books=books, refine=0).to_pandas()
    recalls = []
    for q in ids:
        a = set(adc[adc["query_id"] == q]["vec_id"])
        e = set(exact[exact["query_id"] == q]["vec_id"])
        recalls.append(len(a & e) / len(e))
    assert np.mean(recalls) >= 0.4, recalls
    for q in ids:
        top1 = adc[adc["query_id"] == q].sort_values("rank").iloc[0]
        assert top1["vec_id"] == q


def test_pq_dim_not_divisible_raises(rd):
    import numpy as np
    import pandas as pd
    import pytest

    import ray.data as rdm
    from hydra_ray.stages.similarity import train_pq

    df = pd.DataFrame({"vec_id": [0, 1],
                       "embedding": [np.zeros(10, np.float32)] * 2})
    with pytest.raises(ValueError, match="not divisible"):
        train_pq(rdm.from_pandas(df), m=3)


def test_ivfpq_index_build_search(rd, tmp_path):
    """IVF-PQ persistent index: list files hold only id + m-byte residual
    codes (16x smaller than the float32 vectors they encode), ADC search
    over 4/16 probed lists reaches >=0.5 recall@10 of the exact top-k
    (measured 0.65 at m=16/ksub=256) and always finds the query's own
    vector in its top-3."""
    import glob
    import os

    import numpy as np
    import pyarrow.parquet as pq2

    from hydra_ray.pipelines.batch_queries import _load_queries, _read
    from hydra_ray.stages.similarity import (
        build_ivfpq_index,
        cosine_topk,
        ivfpq_search_index,
    )

    sf = "/root/testdata/sf0.001"
    root = str(tmp_path / "ivfpq")
    build_ivfpq_index(_read(sf, "embeddings"), root,
                      n_centroids=16, m=16, ksub=256, iters=6)
    assert os.path.exists(os.path.join(root, "centroids.parquet"))
    assert os.path.exists(os.path.join(root, "codebooks.parquet"))

    # the lists store codes, not vectors: 16 B + id per row
    files = glob.glob(os.path.join(root, "lists", "**", "*.parquet"),
                      recursive=True)
    total_rows, code_bytes = 0, 0
    for f in files:
        t = pq2.read_table(f)
        assert set(t.column_names) == {"vec_id", "code", "list_id"}
        total_rows += t.num_rows
        if t.num_rows:
            lens = {len(v) for v in t["code"].to_pylist()}
            assert lens == {16}, lens
            code_bytes += 16 * t.num_rows
    assert total_rows == 500
    assert code_bytes == 500 * 16  # vs 500 * 64 * 4 B float32 = 16x larger

    ids, mat = _load_queries(sf)
    ap = ivfpq_search_index(root, ids, mat, k=10, nprobe=4).to_pandas()
    exact = cosine_topk(_read(sf, "embeddings"), ids, mat, 10).to_pandas()
    recalls = []
    for q in ids:
        a = set(ap[ap["query_id"] == q]["vec_id"])
        e = set(exact[exact["query_id"] == q]["vec_id"])
        recalls.append(len(a & e) / len(e))
    assert np.mean(recalls) >= 0.5, recalls
    for q in ids:
        top3 = set(ap[ap["query_id"] == q].sort_values("rank").head(3)["vec_id"])
        assert q in top3, (q, top3)


# ------------------------------------------------------------------------ PCA


def test_pca_matches_numpy_and_partitioning(rd):
    """Distributed moment-partial PCA equals numpy cov+eigh on the full
    matrix (up to float fold order), is partition-count invariant at
    1e-8, and projections reproduce X @ comps.T after centering."""
    import numpy as np
    import pandas as pd

    from hydra_ray.stages.similarity import pca_fit, pca_project

    rng = np.random.default_rng(7)
    d = 16
    # anisotropic cloud: a dominant direction PCA must find
    base = rng.normal(size=(400, d))
    base[:, 0] *= 6.0
    base[:, 1] *= 3.0
    mix = rng.normal(size=(d, d)) * 0.05 + np.eye(d)
    x = base @ mix + rng.normal(size=d)  # shifted
    df = pd.DataFrame({"vec_id": np.arange(400, dtype=np.int64),
                       "embedding": [r.astype(np.float32) for r in x]})
    xf = np.stack(df["embedding"].to_numpy()).astype(np.float64)

    got = {}
    for blocks in (1, 7):
        mean, comps, ratio = pca_fit(rd.from_pandas(df).repartition(blocks),
                                     n_components=3)
        if not got:
            got = {"mean": mean, "comps": comps, "ratio": ratio}
        np.testing.assert_allclose(mean, got["mean"], atol=1e-8)
        np.testing.assert_allclose(comps, got["comps"], atol=1e-7)
        np.testing.assert_allclose(ratio, got["ratio"], atol=1e-10)

    # numpy reference on the float32-rounded matrix
    ref_cov = np.cov(xf, rowvar=False)
    evals, evecs = np.linalg.eigh(ref_cov)
    order = np.argsort(-evals)[:3]
    ref = evecs[:, order].T
    flip = np.sign(ref[np.arange(3), np.abs(ref).argmax(axis=1)])
    ref *= flip[:, None]
    np.testing.assert_allclose(got["mean"], xf.mean(axis=0), atol=1e-9)
    np.testing.assert_allclose(got["comps"], ref, atol=1e-7)
    np.testing.assert_allclose(got["ratio"],
                               np.sort(evals)[::-1][:3] / evals.sum(),
                               atol=1e-9)
    # the planted dominant axis explains the most variance
    assert got["ratio"][0] > got["ratio"][1] > got["ratio"][2]
    assert np.abs(got["comps"][0]).argmax() == 0

    proj = pca_project(rd.from_pandas(df), got["mean"], got["comps"]
                       ).to_pandas().sort_values("vec_id")
    p = np.stack(proj["pc"].to_numpy())
    np.testing.assert_allclose(
        p, (xf - got["mean"]) @ got["comps"].T, atol=1e-8)


def test_pca_too_few_rows_raises(rd):
    import numpy as np
    import pandas as pd
    import pytest

    import ray.data as rdm
    from hydra_ray.stages.similarity import pca_fit

    df = pd.DataFrame({"vec_id": [0],
                       "embedding": [np.zeros(4, np.float32)]})
    with pytest.raises(ValueError, match="at least 2"):
        pca_fit(rdm.from_pandas(df), 2)


def test_weighted_bernoulli_membership_and_guards(rd):
    """Membership equals the integer formula exactly, is monotone in
    weight (w=0 never kept, huge w always kept), partition-invariant,
    and out-of-range ids/weights raise."""
    import numpy as np
    import pandas as pd
    import pytest

    from hydra_ray.stages.sampling import weighted_bernoulli

    n = 5000
    ids = np.arange(n, dtype=np.int64)
    w = (ids % 700).astype(np.int64)  # includes zeros
    df = pd.DataFrame({"id": ids, "w": w})
    num = 1 << 22
    expect = ((ids * 2654435761) % (1 << 32)) < w * num

    got = None
    for blocks in (1, 5):
        out = weighted_bernoulli(rd.from_pandas(df).repartition(blocks),
                                 "id", "w", num=num).to_pandas()
        kept = np.zeros(n, bool)
        kept[out["id"].to_numpy()] = True
        if got is None:
            got = kept
        np.testing.assert_array_equal(kept, got)
    np.testing.assert_array_equal(got, expect)
    assert not got[w == 0].any()          # zero weight never sampled
    assert 0 < got.sum() < n

    # saturated probability: every row kept
    big = df.assign(w=np.int64(1 << 30))
    out = weighted_bernoulli(rd.from_pandas(big), "id", "w", num=num)
    assert out.count() == n

    with pytest.raises(Exception, match="ids must be"):
        weighted_bernoulli(
            rd.from_pandas(pd.DataFrame({"id": [-1], "w": [5]})),
            "id", "w", num=num).to_pandas()
    with pytest.raises(Exception, match="weights must be"):
        weighted_bernoulli(
            rd.from_pandas(pd.DataFrame({"id": [1], "w": [1 << 62]})),
            "id", "w", num=num).to_pandas()
    with pytest.raises(ValueError, match="den must be"):
        weighted_bernoulli(rd.from_pandas(df), "id", "w", num=num, den=0)


def test_interval_overlap_join_matches_bruteforce(rd):
    from hydra_ray.stages.join import interval_overlap_join

    rng = np.random.default_rng(11)
    n_l, n_r = 800, 700
    left = pd.DataFrame({
        "k": rng.integers(0, 25, size=n_l),
        "lid": np.arange(n_l),
        "s": rng.integers(0, 5000, size=n_l).astype(np.int64),
    })
    left["e"] = left["s"] + rng.integers(0, 400, size=n_l)  # incl. zero-length
    right = pd.DataFrame({
        "k": rng.integers(0, 25, size=n_r),
        "rid": np.arange(n_r),
        "s": rng.integers(0, 5000, size=n_r).astype(np.int64),
    })
    right["e"] = right["s"] + rng.integers(0, 900, size=n_r)  # longer, nested

    out = (
        interval_overlap_join(
            rd.from_pandas(left).repartition(5),
            rd.from_pandas(right).repartition(4),
            "k", "s", "e", "s", "e",
            left_cols=["lid"], right_cols=["rid"], num_buckets=8,
        )
        .to_pandas()
        .sort_values(["lid", "rid"])
        .reset_index(drop=True)
    )
    m = left.merge(right, on="k", suffixes=("_l", "_r"))
    m = m[(m["s_l"] < m["e_r"]) & (m["s_r"] < m["e_l"])]
    ref = m[["lid", "rid"]].sort_values(["lid", "rid"]).reset_index(drop=True)
    assert len(out) == len(ref)
    np.testing.assert_array_equal(out["lid"].to_numpy(), ref["lid"].to_numpy())
    np.testing.assert_array_equal(out["rid"].to_numpy(), ref["rid"].to_numpy())
    # joined start/end columns carry through for overlap arithmetic
    assert {"k", "s", "e", "s_r", "e_r"} <= set(out.columns)


def test_normalize_text_matches_duckdb_on_unicode(rd):
    """normalize_text must reproduce DuckDB's
    lower(strip_accents(nfc_normalize(...))) + whitespace collapse on
    NON-ASCII input (the catalog oracle's fixture corpus is ASCII, so
    the unicode semantics are pinned here): ß and the ﬁ ligature
    survive (canonical, not compatibility, decomposition), é/ï/ç fold,
    precomposed vs combining-mark inputs agree."""
    import duckdb

    from hydra_ray.stages.text import normalize_text

    docs = [
        "Café au lait", "ÄÖÜ  groß", "naïve  façade", "ß ﬁne ½",
        "éclair",          # combining acute: NFC first, then strip
        "ø é́ x",     # stacked marks, non-decomposable ø
        "Ａｂｃ İstanbul",        # fullwidth survives, dotted-İ lowers
        "  tabs\tand\nnewlines  ", "", None,
    ]
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(docs)), pa.int64()),
        "text": pa.array(docs, pa.string()),
    }))
    got = normalize_text(ds).to_pandas().sort_values("doc_id")["text"].tolist()
    con = duckdb.connect()
    want = [
        con.sql(
            "select trim(regexp_replace(lower(strip_accents(nfc_normalize("
            "coalesce(?, '')))), '\\s+', ' ', 'g'))",
            params=[s],
        ).fetchone()[0]
        for s in docs
    ]
    assert got == want


def test_skyline2_partition_invariant_and_exact(ray_session):
    """skyline2 == brute-force dominance filter, at 1 and 8 blocks
    (local prune + survivor union is partition-independent)."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from hydra_ray.stages.sort import skyline2

    rng = np.random.default_rng(5)
    n = 4000
    x = rng.integers(0, 500, n).astype(np.int64)
    y = (500 - x + rng.integers(0, 60, n)).astype(np.int64)
    t = pa.table({"id": pa.array(np.arange(n)), "x": pa.array(x),
                  "y": pa.array(y)})

    dominated = np.zeros(n, bool)
    order = np.lexsort((y, x))
    min_y = np.inf
    last_x = None
    run_min = np.inf
    for i in order:  # reference scan (O(n log n), independent impl)
        if last_x is not None and x[i] != last_x:
            min_y = min(min_y, run_min)
            run_min = np.inf
        dominated[i] = (y[i] >= min_y) or (y[i] > run_min)
        run_min = min(run_min, y[i])
        last_x = x[i]
    ref = set(np.flatnonzero(~dominated).tolist())

    for blocks in (1, 8):
        ds = rd.from_arrow(t).repartition(blocks)
        got = set(skyline2(ds, "x", "y").to_pandas()["id"].tolist())
        assert got == ref, (blocks, len(got), len(ref))
