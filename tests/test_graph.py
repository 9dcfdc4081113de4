"""Distributed connected components vs driver union-find."""

import numpy as np
import pandas as pd
import pytest


@pytest.fixture()
def rd(ray_session):
    import ray.data as rd

    return rd


def _uf_labels(pairs):
    parent = {}

    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    nodes = sorted({x for p in pairs for x in p})
    return pd.DataFrame({"node": nodes, "component": [find(n) for n in nodes]})


def _run_cc(rd, pairs, **kw):
    from hydra_ray.stages.graph import connected_components

    df = pd.DataFrame(pairs, columns=["id_a", "id_b"])
    out = (
        connected_components(rd.from_pandas(df).repartition(6), "id_a", "id_b",
                             num_buckets=8, **kw)
        .to_pandas().sort_values("node").reset_index(drop=True)
    )
    return out.astype("int64")


def test_cc_random_graph_matches_union_find(rd):
    rng = np.random.default_rng(7)
    # sparse random graph: many small components + some chains
    pairs = [tuple(sorted(p)) for p in rng.integers(0, 500, size=(400, 2))
             if p[0] != p[1]]
    out = _run_cc(rd, pairs)
    ref = _uf_labels(pairs).reset_index(drop=True)
    pd.testing.assert_frame_equal(out, ref.astype("int64"))


def test_cc_long_chain_and_cycle(rd):
    # a 200-node path (worst case for propagation) + a disjoint cycle
    chain = [(i, i + 1) for i in range(1000, 1200)]
    cycle = [(i, i + 1) for i in range(0, 9)] + [(9, 0)]
    out = _run_cc(rd, chain + cycle)
    ref = _uf_labels(chain + cycle)
    pd.testing.assert_frame_equal(out, ref.astype("int64"))
    assert set(out["component"]) == {0, 1000}


def test_cc_duplicate_and_self_edges(rd):
    pairs = [(1, 2), (2, 1), (1, 1), (2, 3), (5, 5), (7, 8)]
    out = _run_cc(rd, pairs)
    # self-loop-only node 5 has no edge after canon; it is absent
    assert out["node"].tolist() == [1, 2, 3, 7, 8]
    assert out["component"].tolist() == [1, 1, 1, 7, 7]


def test_cc_empty(rd):
    from hydra_ray.stages.graph import connected_components

    df = pd.DataFrame([(1, 1)], columns=["id_a", "id_b"])  # self-loop only
    out = connected_components(rd.from_pandas(df), "id_a", "id_b", num_buckets=8)
    assert out.count() == 0


def test_neardup_clusters_resolvers_identical(rd):
    # driver union-find and distributed CC label the same clusters on the
    # planted near-dup fixture (documents table, sf0.001)
    from hydra_ray.stages.neardup import neardup_clusters

    ds = rd.read_parquet("/root/testdata/sf0.001/documents.parquet",
                         columns=["doc_id", "text"])
    a = neardup_clusters(ds, threshold=0.6).reset_index(drop=True)
    ds2 = rd.read_parquet("/root/testdata/sf0.001/documents.parquet",
                          columns=["doc_id", "text"])
    b = neardup_clusters(ds2, threshold=0.6, resolve="distributed")
    assert len(a) > 0
    pd.testing.assert_frame_equal(a.astype("int64"), b.astype("int64"))


def test_pagerank_matches_dense_power_iteration(ray_session):
    """Distributed PageRank vs a dense numpy power iteration with the
    same dangling-mass redistribution, on a random directed graph with
    dangling nodes and multi-edges."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from hydra_ray.stages.graph import pagerank

    rng = np.random.default_rng(5)
    n, m = 120, 600
    src = rng.integers(0, n - 15, m)         # last 15 nodes: dst-only (dangling)
    dst = rng.integers(0, n, m)
    edges = pd.DataFrame({"s": src, "d": dst})

    iters, damp = 10, 0.85
    nodes = np.unique(np.r_[src, dst])
    N = len(nodes)
    idx = {v: i for i, v in enumerate(nodes)}
    outdeg = np.zeros(N)
    for s in src:
        outdeg[idx[s]] += 1
    r = np.full(N, 1.0 / N)
    for _ in range(iters):
        dang = r[outdeg == 0].sum()
        c = np.zeros(N)
        contrib = r[[idx[s] for s in src]] / outdeg[[idx[s] for s in src]]
        np.add.at(c, [idx[d] for d in dst], contrib)
        r = (1 - damp) / N + damp * (c + dang / N)

    got = (
        pagerank(rd.from_pandas(edges).repartition(4), "s", "d",
                 damping=damp, iters=iters)
        .to_pandas().sort_values("node").reset_index(drop=True)
    )
    assert got["node"].tolist() == nodes.tolist()
    assert abs(got["r"].sum() - 1.0) < 1e-9
    assert np.allclose(got["r"].to_numpy(), r, rtol=1e-9, atol=1e-13)


def test_pagerank_sharded_parity_and_guard(ray_session):
    """pagerank_sharded (actor-sharded rank state) matches the broadcast
    pagerank exactly on the same graph at several shard counts, and the
    broadcast path's max_nodes bound is enforced in code."""
    import numpy as np
    import pandas as pd
    import pytest
    import ray.data as rd

    from hydra_ray.stages.graph import pagerank, pagerank_sharded

    rng = np.random.default_rng(11)
    n, m = 150, 800
    edges = pd.DataFrame({
        "s": rng.integers(0, n - 20, m),   # last 20 ids dst-only (dangling)
        "d": rng.integers(0, n, m),
    })
    ref = (
        pagerank(rd.from_pandas(edges).repartition(4), "s", "d", iters=8)
        .to_pandas().sort_values("node").reset_index(drop=True)
    )
    for S in (1, 3, 8):
        got = (
            pagerank_sharded(rd.from_pandas(edges).repartition(4), "s", "d",
                             iters=8, num_shards=S)
            .to_pandas().sort_values("node").reset_index(drop=True)
        )
        assert got["node"].tolist() == ref["node"].tolist(), S
        assert np.allclose(got["r"], ref["r"], rtol=1e-12, atol=1e-15), S
        assert abs(got["r"].sum() - 1.0) < 1e-9

    with pytest.raises(ValueError, match="max_nodes"):
        pagerank(rd.from_pandas(edges), "s", "d", iters=1, max_nodes=10)


# -------------------------------------------------------- triangle counting


def test_triangle_count_brute_force_and_rho_invariance(rd):
    """Triple-partitioned count equals O(n^3) brute force on a random
    multigraph (self-loops + duplicate/reversed edges in the input) and
    is invariant to the partition parameter rho."""
    import numpy as np
    import pandas as pd

    from hydra_ray.stages.graph import triangle_count

    rng = np.random.default_rng(3)
    n, m = 60, 400
    e = rng.integers(0, n, size=(m, 2))
    # add noise: exact duplicates and reversed copies
    e = np.concatenate([e, e[:50], e[:30, ::-1]])
    df = pd.DataFrame({"s": e[:, 0], "d": e[:, 1]})

    adj = np.zeros((n, n), bool)
    for s, d in e:
        if s != d:
            adj[min(s, d), max(s, d)] = True
    brute = 0
    for i in range(n):
        for j in range(i + 1, n):
            if adj[i, j]:
                brute += int((adj[i, j + 1:] & adj[j, j + 1:]).sum())

    for rho in (1, 3, 8):
        out = triangle_count(rd.from_pandas(df).repartition(4),
                             "s", "d", rho=rho)
        assert int(out["triangles"].iloc[0]) == brute, rho
    assert list(out.columns) == ["triangles"]


def test_cooccurrence_edges_canonical_unique(rd):
    """Co-occurrence edges: one canonical (u<v) row per item pair that
    shares any group, regardless of duplicates or partitioning."""
    import numpy as np
    import pandas as pd

    from hydra_ray.stages.graph import cooccurrence_edges

    df = pd.DataFrame({
        "g": [1, 1, 1, 2, 2, 3, 3, 3, 3],
        "i": [10, 20, 30, 20, 10, 7, 7, 8, 10],
    })
    # duplicate rows too
    df = pd.concat([df, df.iloc[:4]], ignore_index=True)
    expect = {(10, 20), (10, 30), (20, 30), (7, 8), (7, 10), (8, 10)}
    for blocks in (1, 3):
        out = cooccurrence_edges(rd.from_pandas(df).repartition(blocks),
                                 "g", "i").to_pandas()
        got = set(zip(out["u"], out["v"]))
        assert got == expect, got
        assert (out["u"] < out["v"]).all()


def test_k_hop_matches_bfs_reference(rd):
    """k_hop = min hop distance <= k from any seed, vs a dict-BFS
    reference; invariant to partitioning and bucket count; seeds outside
    the graph still appear at dist 0."""
    import collections

    import numpy as np
    import pandas as pd

    from hydra_ray.stages.graph import k_hop

    rng = np.random.default_rng(7)
    u = rng.integers(0, 60, size=150)
    v = rng.integers(0, 60, size=150)
    df = pd.DataFrame({"u": u, "v": v})

    def ref_bfs(edges, seeds, k):
        g = collections.defaultdict(set)
        for a, b in edges:
            if a != b:
                g[a].add(b)
                g[b].add(a)
        dist = {s: 0 for s in seeds}
        frontier = set(seeds)
        for h in range(1, k + 1):
            frontier = {n for f in frontier for n in g[f] if n not in dist}
            for n in frontier:
                dist[n] = h
        return dist

    seeds = [0, 999]  # 999 not in the graph: isolated seed, dist 0
    expect = ref_bfs(zip(df["u"], df["v"]), seeds, 2)
    # threshold ∞ → broadcast regime; 0 → exchange regime; 30 → flips
    # mid-traversal once the reach outgrows it.  All must agree.
    for blocks, buckets, thresh in ((1, 4, 10**9), (5, 3, 10**9),
                                    (4, 4, 0), (4, 4, 30)):
        out = k_hop(rd.from_pandas(df).repartition(blocks), seeds, 2,
                    num_buckets=buckets,
                    broadcast_threshold=thresh).to_pandas()
        got = dict(zip(out["node"], out["dist"]))
        assert got == expect, (thresh, got, expect)

    # k larger than the graph diameter: early exit, full reach (both regimes)
    full = ref_bfs(zip(df["u"], df["v"]), [0], 100)
    for thresh in (10**9, 0):
        out = k_hop(rd.from_pandas(df), [0], 50,
                    broadcast_threshold=thresh).to_pandas()
        assert dict(zip(out["node"], out["dist"])) == full


def test_cooccurrence_edges_with_counts(rd):
    """with_counts=True returns exact pair support (number of distinct
    groups containing both items), invariant to duplicate rows and
    partitioning."""
    import pandas as pd

    from hydra_ray.stages.graph import cooccurrence_edges

    df = pd.DataFrame({
        "g": [1, 1, 1, 2, 2, 3, 3, 3, 3, 4, 4],
        "i": [10, 20, 30, 20, 10, 7, 7, 8, 10, 10, 20],
    })
    df = pd.concat([df, df.iloc[:5]], ignore_index=True)  # dup rows
    # pandas reference: distinct (g,i) → self-join i<j → group count
    pp = df.drop_duplicates()
    m = pp.merge(pp, on="g")
    m = m[m["i_x"] < m["i_y"]]
    expect = (m.groupby(["i_x", "i_y"]).size()
               .rename("pair_count").reset_index())
    expect = {(r.i_x, r.i_y): r.pair_count for r in expect.itertuples()}
    for blocks in (1, 4):
        out = cooccurrence_edges(rd.from_pandas(df).repartition(blocks),
                                 "g", "i", with_counts=True).to_pandas()
        got = {(r.u, r.v): r.pair_count for r in out.itertuples()}
        assert got == expect, (got, expect)


def _naive_lpa(edges, max_rounds):
    """Synchronous LPA with smallest-label ties — multiset neighbor
    counts, per-round simultaneous update, early stop at fixed point."""
    import collections

    adj = collections.defaultdict(list)
    for a, b in edges:
        if a != b:
            adj[a].append(b)
            adj[b].append(a)
    labels = {n: n for n in adj}
    for _ in range(max_rounds):
        new = {}
        for n, nbrs in adj.items():
            cnt = collections.Counter(labels[m] for m in nbrs)
            best = max(cnt.items(), key=lambda kv: (kv[1], -kv[0]))
            new[n] = best[0]
        if new == labels:
            break
        labels = new
    return labels


@pytest.mark.parametrize("path", ["local", ("dist", 1), ("dist", 8)])
def test_label_propagation_matches_naive(ray_session, path):
    import ray.data as rd

    from hydra_ray.stages.graph import label_propagation

    rng = np.random.default_rng(23)
    # two planted cliques + random noise edges between them
    edges = []
    for base in (0, 50):
        nodes = range(base, base + 20)
        edges += [(a, b) for a in nodes for b in nodes if a < b]
    edges += [(int(rng.integers(0, 20)), int(rng.integers(50, 70)))
              for _ in range(10)]
    edges += [(100 + int(rng.integers(0, 30)), 100 + int(rng.integers(0, 30)))
              for _ in range(80)]
    df = pd.DataFrame(edges, columns=["u", "v"])
    # "local" exercises the tiny-graph driver fast path; ("dist", k)
    # forces the distributed loop at k buckets — all must agree exactly
    kw = (dict() if path == "local"
          else dict(local_edges_threshold=0, num_buckets=path[1]))
    out = (
        label_propagation(rd.from_pandas(df).repartition(4), "u", "v",
                          max_rounds=6, **kw)
        .to_pandas().sort_values("node").reset_index(drop=True)
    )
    ref = _naive_lpa(edges, max_rounds=6)
    assert out["node"].tolist() == sorted(ref)
    got = dict(zip(out["node"], out["label"]))
    assert got == ref
    # the two planted cliques resolve to single communities
    assert len({got[n] for n in range(0, 20)}) == 1
    assert len({got[n] for n in range(50, 70)}) == 1


def test_cc_local_and_distributed_paths_identical(rd):
    """The driver fast path (scatter-min + pointer jumping) and the
    alternating-star distributed loop label every node identically."""
    rng = np.random.default_rng(21)
    pairs = [tuple(sorted(p)) for p in rng.integers(0, 800, size=(900, 2))
             if p[0] != p[1]]
    local = _run_cc(rd, pairs)                       # under threshold
    dist = _run_cc(rd, pairs, local_edges_threshold=0)
    assert (local == dist).all().all()
    ref = _uf_labels(pairs).reset_index(drop=True)
    assert (local == ref.astype("int64")).all().all()


def test_pagerank_local_and_distributed_paths_identical(rd):
    """The driver bincount fast path and the broadcast-pull loop rank
    every node identically (1e-12; same float op order per iteration)."""
    rng = np.random.default_rng(17)
    edges = pd.DataFrame({"s": rng.integers(0, 300, 1500),
                          "d": rng.integers(0, 300, 1500)})
    from hydra_ray.stages.graph import pagerank

    local = pagerank(rd.from_pandas(edges).repartition(4), "s", "d",
                     iters=8).to_pandas().sort_values("node")
    dist = pagerank(rd.from_pandas(edges).repartition(4), "s", "d",
                    iters=8, local_edges_threshold=0
                    ).to_pandas().sort_values("node")
    assert local["node"].tolist() == dist["node"].tolist()
    np.testing.assert_allclose(local["r"].to_numpy(),
                               dist["r"].to_numpy(), atol=1e-12)


def test_hits_matches_dense_and_partition_invariant(ray_session):
    """hits() == dense numpy AᵀA power iteration (both local fast path
    and the distributed block-fold), at 1 and 6 blocks."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from hydra_ray.stages.graph import hits

    rng = np.random.default_rng(3)
    n_nodes, n_edges = 60, 900
    src = rng.integers(0, n_nodes, n_edges).astype(np.int64)
    dst = rng.integers(0, n_nodes, n_edges).astype(np.int64)
    t = pa.table({"u": pa.array(src), "v": pa.array(dst)})

    ids = np.unique(np.concatenate([src, dst]))
    n = len(ids)
    A = np.zeros((n, n))
    si = np.searchsorted(ids, src)
    di = np.searchsorted(ids, dst)
    np.add.at(A, (si, di), 1.0)  # multigraph: multiplicity counts
    h = np.full(n, 1.0 / np.sqrt(n)); a = h.copy()
    for _ in range(15):
        a_new = A.T @ h
        h_new = A @ a
        a = a_new / np.linalg.norm(a_new)
        h = h_new / np.linalg.norm(h_new)

    for blocks, thresh in ((1, 200_000), (6, 200_000), (6, 0)):
        ds = rd.from_arrow(t).repartition(blocks)
        out = hits(ds, "u", "v", iters=15,
                   local_edges_threshold=thresh).to_pandas()
        out = out.sort_values("node").reset_index(drop=True)
        assert np.allclose(out["hub"].to_numpy(), h, atol=1e-9), (blocks, thresh)
        assert np.allclose(out["authority"].to_numpy(), a, atol=1e-9)
