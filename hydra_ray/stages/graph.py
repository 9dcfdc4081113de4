"""Distributed connected components over an edge Dataset.

Near-dup clustering ends in "group verified pairs into components".
Driver-side union-find is fine while verified pairs fit on one node, but
at 10^12-doc scale the pair set itself is distributed — this module
implements the alternating large-star / small-star MapReduce algorithm
(Kiveris et al., "Connected Components in MapReduce and Beyond", SoCC
2014 — public paper), which converges in O(log n) rounds, each round a
single hash-bucket shuffle + one vectorized per-bucket kernel.

Contract: input is a Dataset of undirected edges (int64 endpoints,
self-loops ignored); output is a Dataset ``(node, component)`` covering
every endpoint, with ``component`` = the minimum node id of its
component (same labels as union-find-by-min, so the two resolvers are
interchangeable and testable against each other).

Each round materializes the edge Dataset: rounds are iterative, and the
edge set shrinks toward one star edge per non-root node — O(nodes), far
below the corpus the pairs came from.  The per-round convergence probe
is a tiny per-block (count, xor-of-pair-hashes) summary, not a driver
collect of the edges.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["connected_components", "cooccurrence_edges", "hits", "k_core",
           "k_hop", "label_propagation",
           "pagerank", "pagerank_sharded", "random_walks",
           "triangle_count"]


def _fetch_arrow_blocks(ds) -> list[pa.Table]:
    """Materialized block refs as non-empty Arrow tables.  to_arrow_refs
    passes EMPTY pandas blocks through unconverted (0-col
    PandasBlockSchema — seen from map_groups(pandas) upstreams), so both
    formats must be handled before concat_tables."""
    import ray

    out = []
    for b in ray.get(ds.to_arrow_refs()):
        if isinstance(b, pd.DataFrame):
            if len(b) == 0:
                continue
            b = pa.Table.from_pandas(b, preserve_index=False)
        if b.num_rows:
            out.append(b)
    return out


def _star_kernel(g: pd.DataFrame, large: bool) -> pd.DataFrame:
    """One reduce of large-star (input has both edge directions, grouped
    by hash(u)) or small-star (input oriented v <= u, grouped by
    hash(u)).  All nodes in the bucket are resolved in one lexsort +
    reduceat pass."""
    g = g.drop(columns="__bucket")
    if g.empty:
        return pd.DataFrame({"u": pd.Series([], dtype="int64"),
                             "v": pd.Series([], dtype="int64")})
    u = g["u"].to_numpy(dtype=np.int64)
    v = g["v"].to_numpy(dtype=np.int64)
    pos = np.lexsort((v, u))
    u, v = u[pos], v[pos]
    keep = np.r_[True, (u[1:] != u[:-1]) | (v[1:] != v[:-1])]
    u, v = u[keep], v[keep]
    starts = np.flatnonzero(np.r_[True, u[1:] != u[:-1]])
    counts = np.diff(np.r_[starts, len(u)])
    m = np.minimum(np.minimum.reduceat(v, starts), u[starts])
    mrow = np.repeat(m, counts)
    if large:
        mask = v > u
        out_u, out_v = v[mask], mrow[mask]
    else:
        mask = v != mrow
        head = u[starts] != m
        out_u = np.concatenate([v[mask], u[starts][head]])
        out_v = np.concatenate([mrow[mask], m[head]])
    return pd.DataFrame({"u": out_u, "v": out_v})


def connected_components(edges, src_col: str, dst_col: str,
                         num_buckets: int = 64, max_rounds: int = 50,
                         local_edges_threshold: int = 200_000):
    """Return a Dataset ``(node:int64, component:int64)``; component =
    min node id reachable.  O(log n) bucket-shuffle rounds.

    Graphs at or below ``local_edges_threshold`` canon edge rows run a
    vectorized scatter-min + pointer-jumping loop once on the driver
    (same broadcast-small-side rule as ``label_propagation``'s local
    path — a tiny graph would otherwise pay several Dataset-execution
    fixed costs per star round).  Identical output on both paths
    (parity-tested); pass 0 to force the distributed loop."""
    from ..hashing import hash64

    def canon(t: pa.Table) -> pa.Table:
        a = t[src_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        b = t[dst_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        keep = a != b
        a, b = a[keep], b[keep]
        return pa.table({"u": np.maximum(a, b), "v": np.minimum(a, b)})

    ds = edges.map_batches(canon, batch_format="pyarrow").materialize()

    if 0 < local_edges_threshold and ds.count() <= local_edges_threshold:
        import ray.data as rd

        blocks = _fetch_arrow_blocks(ds)
        if not blocks:
            return rd.from_arrow(pa.table({
                "node": pa.array([], pa.int64()),
                "component": pa.array([], pa.int64())}))
        tbl = pa.concat_tables(blocks)
        u = tbl["u"].to_numpy(zero_copy_only=False).astype(np.int64)
        v = tbl["v"].to_numpy(zero_copy_only=False).astype(np.int64)
        nodes = np.unique(np.concatenate([u, v]))
        cu = np.searchsorted(nodes, u)
        cv = np.searchsorted(nodes, v)
        comp = np.arange(len(nodes), dtype=np.int64)
        # nodes are sorted, so min over indices == min over node ids
        while True:
            m = np.minimum(comp[cu], comp[cv])
            new = comp.copy()
            np.minimum.at(new, cu, m)
            np.minimum.at(new, cv, m)
            new = np.minimum(new, new[new])      # pointer jumping
            if np.array_equal(new, comp):
                break
            comp = new
        return rd.from_arrow(pa.table({
            "node": pa.array(nodes, pa.int64()),
            "component": pa.array(nodes[comp], pa.int64())}))

    def tag(t: pa.Table) -> pa.Table:
        b = (hash64(t["u"]) % np.uint64(num_buckets)).astype(np.int32)
        return t.append_column("__bucket", pa.array(b))

    def big_small(t: pa.Table) -> pa.Table:
        u = t["u"].to_numpy(zero_copy_only=False)
        v = t["v"].to_numpy(zero_copy_only=False)
        return pa.table({"u": np.maximum(u, v), "v": np.minimum(u, v)})

    def both_dirs(t: pa.Table) -> pa.Table:
        u = t["u"].to_numpy(zero_copy_only=False)
        v = t["v"].to_numpy(zero_copy_only=False)
        return pa.table({"u": np.concatenate([u, v]),
                         "v": np.concatenate([v, u])})

    def summary(t: pa.Table) -> pa.Table:
        u = t["u"].to_numpy(zero_copy_only=False).astype(np.uint64)
        v = t["v"].to_numpy(zero_copy_only=False).astype(np.uint64)
        h = (np.maximum(u, v) * np.uint64(0x9E3779B97F4A7C15)) ^ np.minimum(u, v)
        x = np.bitwise_xor.reduce(h) if len(h) else np.uint64(0)
        return pa.table({"n": pa.array([t.num_rows], pa.int64()),
                         "x": pa.array([int(x)], pa.uint64())})

    def probe(d):
        rows = d.map_batches(summary, batch_format="pyarrow").take_all()
        n = sum(r["n"] for r in rows)
        x = 0
        for r in rows:
            x ^= r["x"]
        return n, x

    ds = ds.materialize()
    if ds.count() == 0:
        import ray.data as rd

        return rd.from_arrow(pa.table({"node": pa.array([], pa.int64()),
                                       "component": pa.array([], pa.int64())}))

    prev = None
    for _ in range(max_rounds):
        ds = (
            ds.map_batches(both_dirs, batch_format="pyarrow")
            .map_batches(tag, batch_format="pyarrow")
            .groupby("__bucket")
            .map_groups(lambda g: _star_kernel(g, large=True),
                        batch_format="pandas")
            .map_batches(big_small, batch_format="pyarrow")
            .map_batches(tag, batch_format="pyarrow")
            .groupby("__bucket")
            .map_groups(lambda g: _star_kernel(g, large=False),
                        batch_format="pandas")
            .materialize()
        )
        cur = probe(ds)
        if cur == prev:
            break
        prev = cur

    # converged edge set is a star forest (child > root); emit child rows
    # plus one self row per distinct root, deduped in the same buckets
    def child_rows(t: pa.Table) -> pa.Table:
        u = t["u"].to_numpy(zero_copy_only=False)
        v = t["v"].to_numpy(zero_copy_only=False)
        return pa.table({"node": np.concatenate([np.maximum(u, v), np.minimum(u, v)]),
                         "component": np.concatenate([np.minimum(u, v), np.minimum(u, v)])})

    def tag_node(t: pa.Table) -> pa.Table:
        b = (hash64(t["node"]) % np.uint64(num_buckets)).astype(np.int32)
        return t.append_column("__bucket", pa.array(b))

    def resolve(g: pd.DataFrame) -> pd.DataFrame:
        n = g["node"].to_numpy(dtype=np.int64)
        c = g["component"].to_numpy(dtype=np.int64)
        pos = np.lexsort((c, n))
        n, c = n[pos], c[pos]
        starts = np.flatnonzero(np.r_[True, n[1:] != n[:-1]])
        return pd.DataFrame({"node": n[starts], "component": c[starts]})

    return (
        ds.map_batches(child_rows, batch_format="pyarrow")
        .map_batches(tag_node, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(resolve, batch_format="pandas")
    )


def pagerank(edges, src_col: str, dst_col: str, damping: float = 0.85,
             iters: int = 20, max_nodes: int = 1_000_000_000,
             local_edges_threshold: int = 200_000):
    """PageRank by broadcast-pull power iteration (fixed ``iters``).

    Input: a Dataset of DIRECTED int64 edges (a duplicated edge counts
    twice — multigraph semantics; dedupe upstream if unwanted).  Output:
    ``(node, rank)`` over every endpoint, ranks summing to 1.  Dangling
    nodes (no out-edges) redistribute their mass uniformly — the
    standard convention, so ranks stay a probability distribution.

    Scale shape: the edge set stays distributed and is indexed ONCE
    (compact 0..N-1 node ids via searchsorted against the broadcast
    sorted-id vector); each iteration broadcasts the O(nodes) float64
    rank vector (``ray.put`` → zero-copy plasma reads, cached per
    worker), emits per-block contribution partials pre-combined by a
    sort+reduceat (≤ unique-dst-per-block rows leave each task), and
    reduces them with one bucketed ``grouped_aggregate`` shuffle whose
    output is ≤ N rows.  Driver/worker memory is O(nodes) — 8 bytes ×
    N, fine to ~1e9 nodes on the target cluster; the ``max_nodes``
    guard ENFORCES that bound (default 1e9) and points past it to
    ``pagerank_sharded``, whose rank state lives in actors.  Two chained
    groupby shuffles per round (the textbook BSP formulation) deadlock
    Ray Data's aggregator pools under tight CPU budgets and pay two
    all-to-all exchanges per round; this shape pays one.
    """
    import ray

    import pyarrow.compute as _pc

    from .join import _bcast_get
    from .windows import AggSpec, grouped_aggregate

    d = float(damping)

    def canon(t: pa.Table) -> pa.Table:
        return pa.table({
            "src": _pc.cast(t[src_col], pa.int64()),
            "dst": _pc.cast(t[dst_col], pa.int64()),
        })

    e = edges.map_batches(canon, batch_format="pyarrow").materialize()

    # tiny-graph driver fast path: the whole power iteration is a few
    # bincounts once edges fit one node (same broadcast-small-side rule
    # as label_propagation / connected_components — 20 rounds of Dataset
    # execution fixed cost dwarf the microseconds of math); identical
    # output to the distributed loop (parity-tested)
    if 0 < local_edges_threshold and e.count() <= local_edges_threshold:
        import ray.data as rd

        blocks = _fetch_arrow_blocks(e)
        if blocks:
            tbl = pa.concat_tables(blocks)
            src = tbl["src"].to_numpy(zero_copy_only=False)
            dst = tbl["dst"].to_numpy(zero_copy_only=False)
            node_ids = np.unique(np.concatenate([src, dst]))
            n = len(node_ids)
            if n > max_nodes:    # same contract as the broadcast path
                raise ValueError(
                    f"pagerank's rank vector is O(nodes) state; {n} "
                    f"nodes exceeds max_nodes={max_nodes}. Use "
                    "pagerank_sharded (actor-sharded rank state).")
            if n:
                si = np.searchsorted(node_ids, src)
                di = np.searchsorted(node_ids, dst)
                outdeg = np.bincount(si, minlength=n).astype(np.float64)
                dangling = outdeg == 0.0
                safe_deg = np.where(dangling, 1.0, outdeg)
                r = np.full(n, 1.0 / n)
                for _ in range(int(iters)):
                    base = (1.0 - d) / n + d * float(
                        r[dangling].sum()) / n
                    w = r / safe_deg
                    c = np.bincount(di, weights=w[si], minlength=n)
                    r = base + d * c
                return rd.from_arrow(pa.table({
                    "node": pa.array(node_ids, pa.int64()),
                    "r": pa.array(r, pa.float64()),
                }))

    # node table with outdegree: every endpoint appears (dst-only nodes
    # get outdeg 0 = dangling)
    def deg_rows(t: pa.Table) -> pa.Table:
        return pa.table({
            "node": pa.concat_arrays(
                [t["src"].combine_chunks(), t["dst"].combine_chunks()]
            ),
            "outdeg": pa.array(
                np.r_[np.ones(t.num_rows, np.int64),
                      np.zeros(t.num_rows, np.int64)]
            ),
        })

    nd_ds = grouped_aggregate(
        e.map_batches(deg_rows, batch_format="pyarrow"),
        ["node"], [AggSpec("sum", "outdeg", "outdeg")],
    ).materialize()
    n = nd_ds.count()
    if n > max_nodes:        # guard BEFORE the O(nodes) driver collect
        raise ValueError(
            f"pagerank's broadcast rank vector is driver/worker-resident "
            f"O(nodes) state; {n} nodes exceeds max_nodes={max_nodes}. "
            "Use pagerank_sharded (actor-sharded rank state) instead."
        )
    nd = nd_ds.to_pandas()
    node_ids = np.sort(nd["node"].to_numpy(dtype=np.int64))
    outdeg = nd["outdeg"].to_numpy(dtype=np.float64)[
        np.argsort(nd["node"].to_numpy(dtype=np.int64), kind="stable")
    ]
    ids_ref = ray.put(node_ids)

    def to_idx(t: pa.Table) -> pa.Table:
        ids = _bcast_get(ids_ref)
        return pa.table({
            "si": np.searchsorted(ids, t["src"].to_numpy()),
            "di": np.searchsorted(ids, t["dst"].to_numpy()),
        })

    e_idx = e.map_batches(to_idx, batch_format="pyarrow").materialize()

    dangling = outdeg == 0.0
    safe_deg = np.where(dangling, 1.0, outdeg)
    r = np.full(n, 1.0 / n)

    # per-iteration work = one ray task PER MATERIALIZED BLOCK returning
    # a pre-combined dense contribution vector, folded on the driver —
    # NOT a Dataset execution per round: 8 rounds × (map + groupby)
    # executions paid ~2 s of pure per-execution fixed cost at sf0.1
    # (the same block-ref trick as label_propagation).  The fold is
    # O(blocks·nodes) float adds — bounded by the max_nodes guard.
    @ray.remote
    def _block_contrib(t: pa.Table, w, nn: int):
        di = t["di"].to_numpy()
        si = t["si"].to_numpy()
        return np.bincount(di, weights=w[si], minlength=nn)

    block_refs = e_idx.to_arrow_refs()
    for _ in range(int(iters)):
        base = (1.0 - d) / n + d * float(r[dangling].sum()) / n
        w_ref = ray.put(r / safe_deg)
        parts = ray.get([
            _block_contrib.remote(b, w_ref, n) for b in block_refs
        ])
        c = np.sum(parts, axis=0) if parts else np.zeros(n)
        r = base + d * c

    out = pa.table({"node": node_ids, "r": r})
    return ray.data.from_arrow(out)


class _RankShard:
    """One shard of GraphX-style PageRank state: the rank/outdegree
    vectors for ``node % num_shards == shard`` plus the out-edges whose
    SOURCE lives here (src-co-partitioned, so the gather ``w[src]`` is
    local).  Edge routing/reduceat order is precomputed once in
    ``build``; each iteration is one vectorized gather + reduceat and a
    shard-to-shard exchange of pre-combined ``(dst, contribution)``
    partials — nothing O(nodes) ever exists in one place."""

    def __init__(self, shard: int, num_shards: int):
        self.s = shard
        self.S = num_shards
        self._node_chunks: list = []
        self._edge_chunks: list = []

    def add_nodes(self, t: pa.Table) -> int:
        self._node_chunks.append(
            (t["node"].to_numpy(zero_copy_only=False).astype(np.int64),
             t["outdeg"].to_numpy(zero_copy_only=False).astype(np.float64))
        )
        return t.num_rows

    def add_edges(self, t: pa.Table) -> int:
        self._edge_chunks.append(
            (t["src"].to_numpy(zero_copy_only=False).astype(np.int64),
             t["dst"].to_numpy(zero_copy_only=False).astype(np.int64))
        )
        return t.num_rows

    def build(self, n_total: int) -> int:
        nodes = (np.concatenate([c[0] for c in self._node_chunks])
                 if self._node_chunks else np.empty(0, np.int64))
        deg = (np.concatenate([c[1] for c in self._node_chunks])
               if self._node_chunks else np.empty(0, np.float64))
        order = np.argsort(nodes, kind="stable")
        self.nodes, self.outdeg = nodes[order], deg[order]
        self.dangling = self.outdeg == 0.0
        self.safe_deg = np.where(self.dangling, 1.0, self.outdeg)
        self.n_total = int(n_total)
        self.r = np.full(len(self.nodes), 1.0 / max(n_total, 1))
        src = (np.concatenate([c[0] for c in self._edge_chunks])
               if self._edge_chunks else np.empty(0, np.int64))
        dst = (np.concatenate([c[1] for c in self._edge_chunks])
               if self._edge_chunks else np.empty(0, np.int64))
        self._node_chunks = self._edge_chunks = None
        # static per-iteration plan: edges sorted by dst once, per-dst
        # reduceat starts, and the dst→target-shard routing masks
        pos = np.argsort(dst, kind="stable")
        self.si = np.searchsorted(self.nodes, src[pos])
        dsts = dst[pos]
        self.starts = np.flatnonzero(
            np.r_[True, dsts[1:] != dsts[:-1]]) if len(dsts) else \
            np.empty(0, np.int64)
        self.dst_u = dsts[self.starts] if len(dsts) else dsts
        tgt = self.dst_u % self.S
        self.route = [np.flatnonzero(tgt == q) for q in range(self.S)]
        return len(self.nodes)

    def dangling_mass(self) -> float:
        return float(self.r[self.dangling].sum())

    def emit(self):
        """One tuple of S pre-combined ``(dst, c)`` partial tables —
        returned with ``num_returns=S`` so each lands in the object
        store and ships straight to its target shard, never the driver."""
        w = self.r / self.safe_deg
        c = w[self.si]
        sums = (np.add.reduceat(c, self.starts)
                if len(self.starts) else np.empty(0, np.float64))
        out = tuple(
            pa.table({"dst": self.dst_u[idx], "c": sums[idx]})
            for idx in self.route
        )
        return out if self.S > 1 else out[0]

    def apply(self, base: float, damping: float, *parts) -> int:
        acc = np.zeros(len(self.nodes))
        for t in parts:
            idx = np.searchsorted(
                self.nodes, t["dst"].to_numpy(zero_copy_only=False))
            acc[idx] += t["c"].to_numpy(zero_copy_only=False)
        self.r = base + damping * acc
        return len(self.nodes)

    def result(self) -> pa.Table:
        return pa.table({"node": self.nodes, "r": self.r})


def pagerank_sharded(edges, src_col: str, dst_col: str,
                     damping: float = 0.85, iters: int = 20,
                     num_shards: int = 8):
    """PageRank with ACTOR-SHARDED rank state — the scale path past
    ``pagerank``'s ~1e9-node broadcast ceiling.

    Same semantics as ``pagerank`` (directed multigraph edges, dangling
    mass redistributed, ranks sum to 1); different state layout: the
    rank/outdegree vectors are hash-sharded (``node % num_shards``)
    across ``num_shards`` actors, and every out-edge is co-partitioned
    with its SOURCE shard, so per-iteration work is (a) a local gather +
    reduceat per shard pre-combining contributions per destination, (b)
    one shard-to-shard object-store exchange of those ≤ unique-dst
    partials (``num_returns=num_shards`` — the driver only moves refs),
    (c) a local scatter-add per shard.  The driver holds O(num_shards)
    scalars (the dangling-mass fold).  ``num_shards`` bounds per-actor
    memory: size it to nodes/num_shards × ~24 bytes, independent of the
    cluster (semantic, like every partition count here).
    """
    import ray

    import pyarrow.compute as _pc

    from .windows import AggSpec, grouped_aggregate

    S = int(num_shards)
    d = float(damping)

    def canon(t: pa.Table) -> pa.Table:
        return pa.table({
            "src": _pc.cast(t[src_col], pa.int64()),
            "dst": _pc.cast(t[dst_col], pa.int64()),
        })

    e = edges.map_batches(canon, batch_format="pyarrow").materialize()

    def deg_rows(t: pa.Table) -> pa.Table:
        return pa.table({
            "node": pa.concat_arrays(
                [t["src"].combine_chunks(), t["dst"].combine_chunks()]
            ),
            "outdeg": pa.array(
                np.r_[np.ones(t.num_rows, np.int64),
                      np.zeros(t.num_rows, np.int64)]
            ),
        })

    nd = grouped_aggregate(
        e.map_batches(deg_rows, batch_format="pyarrow"),
        ["node"], [AggSpec("sum", "outdeg", "outdeg")],
    ).materialize()
    n = nd.count()
    if n == 0:
        return ray.data.from_arrow(
            pa.table({"node": pa.array([], pa.int64()),
                      "r": pa.array([], pa.float64())}))

    Shard = ray.remote(_RankShard)
    actors = [Shard.remote(s, S) for s in range(S)]

    def route(t: pa.Table, col: str, method: str):
        key = t[col].to_numpy(zero_copy_only=False).astype(np.int64) % S
        refs = []
        for q in np.unique(key):
            sub = t.filter(pa.array(key == q))
            refs.append(getattr(actors[int(q)], method).remote(sub))
        return refs

    def feed_nodes(t: pa.Table) -> pa.Table:
        import ray as _r
        _r.get(route(t, "node", "add_nodes"))
        return pa.table({"n": pa.array([t.num_rows], pa.int64())})

    def feed_edges(t: pa.Table) -> pa.Table:
        import ray as _r
        _r.get(route(t, "src", "add_edges"))
        return pa.table({"n": pa.array([t.num_rows], pa.int64())})

    # drive the two routing passes (map_batches tasks deliver to actors)
    nd.map_batches(feed_nodes, batch_format="pyarrow").count()
    e.map_batches(feed_edges, batch_format="pyarrow").count()
    ray.get([a.build.remote(n) for a in actors])

    try:
        for _ in range(int(iters)):
            dm = sum(ray.get([a.dangling_mass.remote() for a in actors]))
            base = (1.0 - d) / n + d * dm / n
            # S×S ref matrix: parts[src_shard][dst_shard]; data moves
            # shard→shard through the object store, refs through the driver
            if S > 1:
                parts = [a.emit.options(num_returns=S).remote()
                         for a in actors]
            else:
                parts = [[a.emit.remote()] for a in actors]
            ray.get([
                actors[q].apply.remote(
                    base, d, *[parts[p][q] for p in range(S)])
                for q in range(S)
            ])
        # per-shard result tables stay in the object store — the driver
        # holds refs only, never the O(nodes) concatenation
        res_refs = [a.result.remote() for a in actors]
        ray.wait(res_refs, num_returns=len(res_refs))
    finally:
        for a in actors:
            ray.kill(a, no_restart=True)
    return ray.data.from_arrow_refs(res_refs)


def _intra_run_pairs(sorted_keys: np.ndarray, values: np.ndarray):
    """All (values[i], values[j]) pairs with i < j inside each equal-key
    run of the key-sorted arrays — pure arange/repeat index math, no
    Python loop (the combination-generation kernel shared by wedge
    enumeration and co-occurrence edge building)."""
    n = len(sorted_keys)
    if n == 0:
        return values[:0], values[:0]
    new = np.r_[True, sorted_keys[1:] != sorted_keys[:-1]]
    run_start = np.maximum.accumulate(np.where(new, np.arange(n), 0))
    local = np.arange(n) - run_start
    total = int(local.sum())
    if total == 0:
        return values[:0], values[:0]
    sec = np.repeat(np.arange(n), local)
    block = np.concatenate(([0], np.cumsum(local)))[:-1]
    within = np.arange(total) - np.repeat(block, local)
    first = np.repeat(run_start, local) + within
    return values[first], values[sec]


def cooccurrence_edges(ds, group_col: str, item_col: str,
                       num_buckets: int = 64, with_counts: bool = False):
    """Canonical undirected edges between items sharing a group (the
    market-basket co-occurrence graph): per-batch distinct
    (group, item) → ONE hash(group) bucket exchange → per-bucket
    vectorized intra-group pair generation → global pair dedup.

    ``with_counts=True`` returns (u, v, pair_count) instead — the
    SUPPORT of each pair (number of distinct groups containing both),
    reduced by the combiner-partial ``grouped_aggregate`` so the second
    exchange carries one row per distinct pair per block.

    Pair count per group is C(size, 2): bounded group sizes (order
    baskets, sessions) keep the blow-up linear; unbounded hot groups
    should be capped upstream (``per_key_topn``)."""
    from .dedup import bucketed_distinct

    def local(df: pd.DataFrame) -> pd.DataFrame:
        out = df[[group_col, item_col]].drop_duplicates()
        h = pd.util.hash_pandas_object(out[group_col], index=False).to_numpy()
        return out.assign(__bucket=(h % num_buckets).astype("int64"))

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        gg = g[[group_col, item_col]].drop_duplicates()
        k = gg[group_col].to_numpy()
        it = gg[item_col].to_numpy()
        pos = np.lexsort((it, k))
        a, b = _intra_run_pairs(k[pos], it[pos])  # ascending in each run → a < b
        out = pd.DataFrame({"u": a, "v": b})
        # one row per (group, pair): duplicates across groups ARE the
        # support signal when counting, noise when not
        return out if with_counts else out.drop_duplicates()

    pe = ds.map_batches(local, batch_format="pandas").groupby(
        "__bucket").map_groups(pairs, batch_format="pandas")
    if with_counts:
        from .windows import AggSpec, grouped_aggregate

        return grouped_aggregate(
            pe, ["u", "v"], [AggSpec("count", None, "pair_count")])
    return bucketed_distinct(pe, ["u", "v"], num_buckets=num_buckets)


def k_hop(edges, seeds, k: int, src_col: str = "u", dst_col: str = "v",
          num_buckets: int = 32, broadcast_threshold: int = 4_000_000):
    """Multi-source BFS over an undirected edge Dataset: returns
    ``(node:int64, dist:int64)`` with dist = min #hops (<= k) from any
    seed, seeds included at dist 0.

    Two regimes, chosen per hop from the (known, materialized) size of
    the reached set:

    - **Broadcast regime** (reach ≤ ``broadcast_threshold``, the common
      k-hop-neighborhood case): the sorted frontier + visited node
      arrays ship once via ``ray.put`` and expansion is a SHUFFLE-FREE
      ``map_batches`` over the resident adjacency — membership probe,
      visited anti-probe, per-block dedup — followed by one small
      bucketed distinct over only the NEW nodes.  The adjacency itself
      never re-sorts (the measured cost of the exchange regime: two
      full-adjacency sorts per hop).

    - **Exchange regime** (reach too big to broadcast — hub-dominated
      graphs reach most of the corpus in 2-3 hops): Pregel-style, TWO
      hash-bucket exchanges per hop — (adjacency ∪ frontier) grouped by
      hash(node) emits dist=h+1 candidates; (dist ∪ candidates) grouped
      by hash(node) keeps min dist per node.  Nothing lands on the
      driver; the convergence probe is a per-block count.

    Both regimes produce identical results (the broadcast-regime test
    pins parity).  For deep traversals (k >> log n) in the exchange
    regime, a shard-actor design holding resident CSR shards
    (pagerank_sharded) would amortize the per-hop adjacency ride; k-hop
    neighborhood queries (k <= ~6) don't need it.
    """
    import ray
    import ray.data as rd

    from ..hashing import hash64
    from .dedup import bucketed_distinct
    from .join import _bcast_get

    def sym(t: pa.Table) -> pa.Table:
        a = t[src_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        b = t[dst_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        keep = a != b
        a, b = a[keep], b[keep]
        return pa.table({"node": np.concatenate([a, b]),
                         "nbr": np.concatenate([b, a]),
                         "__f": np.zeros(2 * len(a), dtype=np.int8)})

    adj = edges.map_batches(sym, batch_format="pyarrow").materialize()

    def tag(t: pa.Table) -> pa.Table:
        bkt = (hash64(t["node"]) % np.uint64(num_buckets)).astype(np.int32)
        return t.append_column("__bucket", pa.array(bkt))

    seed_arr = np.unique(np.asarray(list(seeds), dtype=np.int64))
    dist = rd.from_arrow(pa.table({
        "node": seed_arr,
        "dist": np.zeros(len(seed_arr), dtype=np.int64)}))

    def frontier_rows(h: int):
        def _f(t: pa.Table) -> pa.Table:
            n = t.filter(pc.equal(t["dist"], h))["node"]
            z = np.zeros(len(n), dtype=np.int64)
            return pa.table({"node": n, "nbr": pa.array(z),
                             "__f": np.ones(len(n), dtype=np.int8)})
        return _f

    def expand(g: pd.DataFrame) -> pd.DataFrame:
        f = np.unique(g.loc[g["__f"] == 1, "node"].to_numpy(dtype=np.int64))
        empty = pd.DataFrame({"node": pd.Series([], dtype="int64")})
        if len(f) == 0:
            return empty
        a = g.loc[g["__f"] == 0, ["node", "nbr"]]
        an = a["node"].to_numpy(dtype=np.int64)
        i = np.searchsorted(f, an)
        hit = (i < len(f)) & (f[np.minimum(i, len(f) - 1)] == an)
        out = np.unique(a["nbr"].to_numpy(dtype=np.int64)[hit])
        return pd.DataFrame({"node": out}) if len(out) else empty

    def with_dist(h: int):
        def _d(t: pa.Table) -> pa.Table:
            return pa.table({
                "node": t["node"],
                "dist": np.full(t.num_rows, h, dtype=np.int64)})
        return _d

    def min_dist(g: pd.DataFrame) -> pd.DataFrame:
        n = g["node"].to_numpy(dtype=np.int64)
        d = g["dist"].to_numpy(dtype=np.int64)
        pos = np.lexsort((d, n))
        n, d = n[pos], d[pos]
        starts = np.flatnonzero(np.r_[True, n[1:] != n[:-1]])
        return pd.DataFrame({"node": n[starts], "dist": d[starts]})

    def new_count(h: int):
        def _c(t: pa.Table) -> pa.Table:
            m = pc.sum(pc.cast(
                pc.equal(t["dist"], h), pa.int64())).as_py()
            return pa.table({"n": pa.array([int(m or 0)], pa.int64())})
        return _c

    def bcast_expand(fref, vref):
        def _e(t: pa.Table) -> pa.Table:
            f = _bcast_get(fref)
            vis = _bcast_get(vref)
            an = t["node"].to_numpy(zero_copy_only=False)
            i = np.searchsorted(f, an)
            hit = (i < len(f)) & (f[np.minimum(i, len(f) - 1)] == an)
            nbr = np.unique(t["nbr"].to_numpy(zero_copy_only=False)[hit])
            j = np.searchsorted(vis, nbr)
            new = nbr[(j >= len(vis))
                      | (vis[np.minimum(j, len(vis) - 1)] != nbr)]
            return pa.table({"node": new})
        return _e

    reach = len(seed_arr)
    for h in range(int(k)):
        if reach <= broadcast_threshold:
            # ---- broadcast regime: collect the (small) reached set
            cur = dist.to_pandas()  # bounded by broadcast_threshold
            nodes = cur["node"].to_numpy(dtype=np.int64)
            dists = cur["dist"].to_numpy(dtype=np.int64)
            frontier_nodes = np.sort(nodes[dists == h])
            if len(frontier_nodes) == 0:
                break
            fref = ray.put(frontier_nodes)
            vref = ray.put(np.sort(nodes))
            cand = bucketed_distinct(
                adj.map_batches(bcast_expand(fref, vref),
                                batch_format="pyarrow"),
                ["node"], num_buckets=num_buckets,
            ).map_batches(with_dist(h + 1), batch_format="pyarrow")
            dist = dist.union(cand).materialize()
            new_reach = dist.count()
            if new_reach == reach:
                break
            reach = new_reach
            continue
        # ---- exchange regime: nothing lands on the driver
        frontier = dist.map_batches(frontier_rows(h), batch_format="pyarrow")
        cand = (
            adj.union(frontier)
            .map_batches(tag, batch_format="pyarrow")
            .groupby("__bucket")
            .map_groups(expand, batch_format="pandas")
            .map_batches(with_dist(h + 1), batch_format="pyarrow")
        )
        dist = (
            dist.union(cand)
            .map_batches(tag, batch_format="pyarrow")
            .groupby("__bucket")
            .map_groups(min_dist, batch_format="pandas")
            .materialize()
        )
        reach = dist.count()
        if h + 1 == int(k):
            break  # last hop: no next frontier to probe for
        fresh = sum(r["n"] for r in dist.map_batches(
            new_count(h + 1), batch_format="pyarrow").take_all())
        if fresh == 0:
            break
    return dist


def triangle_count(edges, src_col: str = "u", dst_col: str = "v",
                   rho: int = 8, assume_canonical: bool = False):
    """Exact global triangle count via triple partitioning (the GP
    scheme of Suri & Vassilvitskii, "Counting Triangles and the Curse
    of the Last Reducer", WWW 2011 — public paper): nodes hash into
    ``rho`` buckets, each edge is replicated to the C(rho+2,3) sorted
    bucket TRIPLES containing both endpoints (exactly ``rho`` copies),
    and each triple task counts its local triangles with the ownership
    rule "sorted node-bucket triple == task triple" so every triangle
    is counted exactly once.

    Why this shape: the textbook wedge-join MapReduce shuffles every
    wedge (Σ C(out-degree, 2) rows — 41 M at sf0.1 here); triple
    partitioning shuffles only ``rho``× the EDGES (9.6 M rows) and the
    wedges are generated and probed inside one numpy kernel per task,
    never touching the object store.  Inside each task the adjacency
    is degree-oriented ((deg, node) order), which bounds the per-node
    wedge fan-out at O(√m) — the "last reducer" fix.

    Self-loops are dropped; duplicate/undirected input is fine (edges
    are canonicalized and deduped first).  ``assume_canonical=True``
    skips that exchange when the input is already unique with
    ``src_col < dst_col`` per row (e.g. straight from
    ``cooccurrence_edges``).  Returns a 1-row pandas DataFrame
    ``{"triangles": int64}``.
    """
    from ..hashing import hash64
    from .dedup import bucketed_distinct

    if rho < 1 or rho > 64:
        raise ValueError(f"rho must be in [1, 64], got {rho}")

    def canon(t: pa.Table) -> pa.Table:
        s = t[src_col].to_numpy(zero_copy_only=False).astype(np.int64)
        d = t[dst_col].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = s != d
        s, d = s[keep], d[keep]
        return pa.table({"u": pa.array(np.minimum(s, d)),
                         "v": pa.array(np.maximum(s, d))})

    if assume_canonical:
        ce = edges.map_batches(
            lambda t: pa.table({"u": t[src_col].cast(pa.int64()),
                                "v": t[dst_col].cast(pa.int64())}),
            batch_format="pyarrow")
    else:
        ce = bucketed_distinct(
            edges.map_batches(canon, batch_format="pyarrow"), ["u", "v"])

    # triple ids: tid = (i*rho + j)*rho + k for i <= j <= k
    def replicate(t: pa.Table) -> pa.Table:
        u = t["u"].to_numpy(zero_copy_only=False)
        v = t["v"].to_numpy(zero_copy_only=False)
        pu = (hash64(t["u"]) % np.uint64(rho)).astype(np.int64)
        pv = (hash64(t["v"]) % np.uint64(rho)).astype(np.int64)
        n = len(u)
        ur = np.repeat(u, rho)
        vr = np.repeat(v, rho)
        a = np.repeat(pu, rho)
        b = np.repeat(pv, rho)
        c = np.tile(np.arange(rho, dtype=np.int64), n)
        tri = np.sort(np.stack([a, b, c], axis=1), axis=1)
        tid = (tri[:, 0] * rho + tri[:, 1]) * rho + tri[:, 2]
        return pa.table({"u": pa.array(ur), "v": pa.array(vr),
                         "__tid": pa.array(tid)})

    rep = ce.map_batches(replicate, batch_format="pyarrow")

    def count_task(g: pd.DataFrame) -> pd.DataFrame:
        tid = int(g["__tid"].iloc[0])
        i, jk = divmod(tid, rho * rho)
        j, kk = divmod(jk, rho)
        task = np.array([i, j, kk], np.int64)
        u = g["u"].to_numpy(dtype=np.int64)
        v = g["v"].to_numpy(dtype=np.int64)
        nodes, inv = np.unique(np.concatenate([u, v]), return_inverse=True)
        ui, vi = inv[:len(u)], inv[len(u):]
        nn = len(nodes)
        deg = np.bincount(ui, minlength=nn) + np.bincount(vi, minlength=nn)
        # sorted canonical edge keys (by node-id order: ui < vi holds
        # because node ids are sorted by np.unique and u < v)
        ekeys = np.sort(ui * nn + vi)
        # degree orientation lo -> hi by (deg, node)
        swap = (deg[vi] < deg[ui]) | ((deg[vi] == deg[ui]) & (vi < ui))
        lo = np.where(swap, vi, ui)
        hi = np.where(swap, ui, vi)
        pos = np.lexsort((hi, lo))
        los, his = lo[pos], hi[pos]
        fidx, sidx = _intra_run_pairs(los, np.arange(len(pos)))
        a, b = his[fidx], his[sidx]  # wedge endpoints
        wk = np.minimum(a, b) * nn + np.maximum(a, b)
        hit = ekeys[np.searchsorted(ekeys, wk, side="left").clip(0, len(ekeys) - 1)] == wk
        if not hit.any():
            return pd.DataFrame({"n": np.array([0], np.int64)})
        # ownership: count only triangles whose sorted node-bucket
        # triple IS this task's triple (mono/dual-bucket triangles
        # appear in several tasks otherwise)
        cidx = los[sidx][hit]
        ta, tb = a[hit], b[hit]
        nb = (hash64(nodes) % np.uint64(rho)).astype(np.int64)
        tri = np.sort(np.stack([nb[cidx], nb[ta], nb[tb]], axis=1), axis=1)
        own = (tri == task[None, :]).all(axis=1)
        return pd.DataFrame({"n": np.array([int(own.sum())], np.int64)})

    parts = rep.groupby("__tid").map_groups(count_task, batch_format="pandas")
    total = int(parts.to_pandas()["n"].sum())
    return pd.DataFrame({"triangles": np.array([total], np.int64)})


_LPA_SUMMARY_REMOTE = None


def _lpa_summary_handle():
    """Lazily-built remote (node,label) block checksummer (ray import
    stays function-local like the rest of this module)."""
    global _LPA_SUMMARY_REMOTE
    if _LPA_SUMMARY_REMOTE is None:
        import ray

        def _summary(t) -> tuple[int, int]:
            # empty map_groups buckets materialize as 0-row 0-col blocks
            # — and may arrive as raw PANDAS blocks (to_arrow_refs does
            # not convert empties)
            if isinstance(t, pd.DataFrame):
                if len(t) == 0 or "node" not in t.columns:
                    return (len(t), 0)
                t = pa.Table.from_pandas(t, preserve_index=False)
            if t.num_rows == 0 or "node" not in t.column_names:
                return (t.num_rows, 0)
            n = t["node"].to_numpy(zero_copy_only=False).astype(np.uint64)
            l = t["label"].to_numpy(zero_copy_only=False).astype(np.uint64)
            h = (n * np.uint64(0x9E3779B97F4A7C15)) ^ l
            x = np.bitwise_xor.reduce(h) if len(h) else np.uint64(0)
            return (t.num_rows, int(x))

        _LPA_SUMMARY_REMOTE = ray.remote(num_cpus=0.5)(_summary)
    return _LPA_SUMMARY_REMOTE


def label_propagation(edges, src_col: str, dst_col: str,
                      max_rounds: int = 10, num_buckets: int | None = None,
                      local_edges_threshold: int = 200_000):
    """Community detection by synchronous label propagation (Raghavan
    2007): labels start as node ids; each round every node adopts the
    most frequent label among its NEIGHBORS, ties to the smallest label.
    Deterministic and partition-invariant (the classic async/random-order
    LPA is neither — the synchronous+smallest-tie variant is the
    published determinization).  Returns ``(node:int64, label:int64)``.

    Synchronous LPA can oscillate on bipartite structures, so rounds are
    bounded by ``max_rounds`` and the loop exits early on a fixed point
    (checksum probe, no driver label collect).

    Scale shape per round: ONE hash(src)-bucket exchange joins labels to
    edges (searchsorted map, no Python per node), then ONE hash(dst)-
    bucket exchange resolves every node's mode with two lexsorts +
    run-length reduces.  Label state lives in the Dataset, never on the
    driver — unlike `pagerank`, there is no O(nodes) driver vector.

    Graphs at or below ``local_edges_threshold`` canon edge rows instead
    run the SAME vectorized kernel once on the driver (one block fetch,
    O(edges) driver memory — the broadcast-small-side justification): a
    3.6 k-edge graph would otherwise pay ~6 Dataset-execution fixed
    costs per round for microseconds of math.  Output is identical on
    both paths (parity-tested); pass 0 to force the distributed loop.
    """
    from ..hashing import hash64

    def canon(t: pa.Table) -> pa.Table:
        a = t[src_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        b = t[dst_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        keep = a != b
        a, b = a[keep], b[keep]
        return pa.table({"u": np.concatenate([a, b]),
                         "v": np.concatenate([b, a])})

    ed = edges.map_batches(canon, batch_format="pyarrow").materialize()
    n_edges = ed.count()
    if n_edges == 0:
        import ray.data as rd

        return rd.from_arrow(pa.table({"node": pa.array([], pa.int64()),
                                       "label": pa.array([], pa.int64())}))
    if n_edges <= local_edges_threshold:
        import ray
        import ray.data as rd

        tbl = pa.concat_tables(_fetch_arrow_blocks(ed))
        u = tbl["u"].to_numpy(zero_copy_only=False).astype(np.int64)
        v = tbl["v"].to_numpy(zero_copy_only=False).astype(np.int64)
        nodes = np.unique(u)  # canon emits both directions ⇒ u covers all
        cu = np.searchsorted(nodes, u)
        cv = np.searchsorted(nodes, v)
        lab = np.arange(len(nodes), dtype=np.int64)  # dense label codes
        lab_val = nodes.copy()                       # code → label value
        for _ in range(max_rounds):
            n_, l_ = cv, lab_val[lab[cu]]
            pos = np.lexsort((l_, n_))
            n_, l_ = n_[pos], l_[pos]
            first = np.r_[True, (n_[1:] != n_[:-1]) | (l_[1:] != l_[:-1])]
            starts = np.flatnonzero(first)
            cnt = np.diff(np.append(starts, len(n_)))
            gn, gl = n_[starts], l_[starts]
            p2 = np.lexsort((gl, -cnt, gn))
            gn2, gl2 = gn[p2], gl[p2]
            keep = np.r_[True, gn2[1:] != gn2[:-1]]
            # gn2[keep] is exactly arange(n_nodes): every node receives
            # ≥ 1 message (both edge directions are present)
            new = np.searchsorted(nodes, gl2[keep])
            if np.array_equal(new, lab):
                break
            lab = new
        return rd.from_arrow(pa.table({"node": nodes,
                                       "label": lab_val[lab]}))
    if num_buckets is None:
        # DATA-derived reduce granularity (~50 k canon edge rows per
        # bucket): 64 fixed buckets on a tiny graph pays 6×64 per-task
        # scheduling costs per round that dwarf the rows (measured 9 s
        # for a 3.6 k-edge graph); at 100 TB the same rule yields
        # thousands of buckets.  Bucketing only sets parallelism —
        # results are bucket-count invariant (tested).
        num_buckets = int(max(8, min(256, n_edges // 50_000 + 8)))
        ed = ed.repartition(min(num_buckets, max(1, ed.num_blocks()))) \
               .materialize()

    def tag_u(t: pa.Table) -> pa.Table:
        b = (hash64(t["u"]) % np.uint64(num_buckets)).astype(np.int32)
        return t.append_column("__bucket", pa.array(b))

    def tag_node(t: pa.Table) -> pa.Table:
        b = (hash64(t["node"]) % np.uint64(num_buckets)).astype(np.int32)
        return t.append_column("__bucket", pa.array(b))

    def init_labels(g: pd.DataFrame) -> pd.DataFrame:
        u = np.unique(g["u"].to_numpy(dtype=np.int64))
        return pd.DataFrame({"node": u, "label": u})

    labels = (
        ed.map_batches(tag_u, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(init_labels, batch_format="pandas")
        .materialize()
    )

    def emit_msgs(g: pd.DataFrame) -> pd.DataFrame:
        lab = g[g["__side"] == 1]
        eg = g[g["__side"] == 0]
        if eg.empty or lab.empty:
            return pd.DataFrame({"node": pd.Series([], dtype="int64"),
                                 "label": pd.Series([], dtype="int64")})
        ln = lab["node"].to_numpy(dtype=np.int64)
        ll = lab["label"].to_numpy(dtype=np.int64)
        order = np.argsort(ln)
        ln, ll = ln[order], ll[order]
        u = eg["u"].to_numpy(dtype=np.int64)
        v = eg["v"].to_numpy(dtype=np.int64)
        idx = np.searchsorted(ln, u)
        return pd.DataFrame({"node": v, "label": ll[idx]})

    def mode_kernel(g: pd.DataFrame) -> pd.DataFrame:
        n = g["node"].to_numpy(dtype=np.int64)
        l = g["label"].to_numpy(dtype=np.int64)
        pos = np.lexsort((l, n))
        n, l = n[pos], l[pos]
        first = np.r_[True, (n[1:] != n[:-1]) | (l[1:] != l[:-1])]
        starts = np.flatnonzero(first)
        cnt = np.diff(np.append(starts, len(n)))
        gn, gl = n[starts], l[starts]
        # per node: max count, ties to smallest label — lexsort puts the
        # winner first in (node, -count, label) order
        p2 = np.lexsort((gl, -cnt, gn))
        gn2, gl2 = gn[p2], gl[p2]
        keep = np.r_[True, gn2[1:] != gn2[:-1]]
        return pd.DataFrame({"node": gn2[keep], "label": gl2[keep]})

    def probe(d):
        # checksum straight off the MATERIALIZED block refs: one tiny
        # remote task per block + a driver fold of (n, xor) pairs — a
        # map_batches().take_all() here would pay Ray Data's ~1 s
        # per-execution fixed cost once per round (measured: the probes
        # were half of q_communities' wall-clock)
        import ray

        fn = _lpa_summary_handle()
        parts = ray.get([fn.remote(r) for r in d.to_arrow_refs()])
        n = sum(p[0] for p in parts)
        x = int(np.bitwise_xor.reduce(
            np.array([p[1] for p in parts], np.uint64))) if parts else 0
        return (n, x)

    def side(v: int):
        def f(t: pa.Table) -> pa.Table:
            return t.append_column(
                "__side", pa.array([v] * t.num_rows, pa.int8()))
        return f

    prev = probe(labels)
    for _ in range(max_rounds):
        lab_tagged = labels.map_batches(
            lambda t: t.append_column("u", t["node"]), batch_format="pyarrow"
        ).map_batches(side(1), batch_format="pyarrow")
        both = ed.map_batches(side(0), batch_format="pyarrow").union(lab_tagged)
        labels = (
            both.map_batches(tag_u, batch_format="pyarrow")
            .groupby("__bucket")
            .map_groups(emit_msgs, batch_format="pandas")
            .map_batches(tag_node, batch_format="pyarrow")
            .groupby("__bucket")
            .map_groups(mode_kernel, batch_format="pandas")
            .materialize()
        )
        cur = probe(labels)
        if cur == prev:
            break
        prev = cur
    return labels


def _mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer over uint64 arrays (public-domain constant
    mixer) — the deterministic per-(walk, step) choice source."""
    x = x.astype(np.uint64, copy=True)
    x ^= x >> np.uint64(30)
    x *= np.uint64(0xBF58476D1CE4E5B9)
    x ^= x >> np.uint64(27)
    x *= np.uint64(0x94D049BB133111EB)
    x ^= x >> np.uint64(31)
    return x


def _walk_step(adj_u: np.ndarray, adj_v: np.ndarray, wid: np.ndarray,
               cur: np.ndarray, step: int, seed: int) -> np.ndarray:
    """Next node for each walk: the hash-picked neighbor of ``cur`` in
    the (u-sorted) adjacency rows.  Pure function of (walk_id, step,
    seed) and the graph — partition/resume invariant."""
    lo = np.searchsorted(adj_u, cur, "left")
    hi = np.searchsorted(adj_u, cur, "right")
    deg = hi - lo
    h = _mix64(wid.astype(np.uint64)
               ^ (np.uint64(step) * np.uint64(0x9E3779B97F4A7C15))
               ^ np.uint64(seed & 0xFFFFFFFFFFFFFFFF))
    pick = lo + (h % np.maximum(deg, 1).astype(np.uint64)).astype(np.int64)
    nxt = adj_v[np.minimum(pick, len(adj_v) - 1)] if len(adj_v) else cur
    return np.where(deg > 0, nxt, cur)  # isolated node: walk stays put


def random_walks(edges, src_col: str, dst_col: str, walk_len: int = 8,
                 walks_per_node: int = 1, seed: int = 1,
                 num_buckets: int | None = None,
                 local_edges_threshold: int = 200_000):
    """Deterministic uniform random walks over the undirected graph —
    the node2vec/DeepWalk corpus generator (Perozzi 2014), determinized:
    the step-``s`` choice of walk ``w`` is ``splitmix64(w ⊕ s·φ ⊕ seed)
    mod degree(cur)`` over the DISTINCT (u, v)-sorted neighbor list — a
    pure function of the data, so output is partition-, resume-,
    bucket-count- and edge-multiplicity-invariant (no RNG state).

    Returns ``(walk_id:int64, origin:int64, step:int64, node:int64)``
    rows, ``walk_len + 1`` rows per walk (step 0 = origin).  Walk ids
    are ``origin · walks_per_node + k`` — reproducible addressing.

    Scale shape: adjacency and frontier co-partition by hash(node) %
    num_buckets; each step is ONE bucket exchange + a searchsorted pick
    per bucket (the LPA conventions).  Graphs at or below
    ``local_edges_threshold`` run all steps on the driver in one pass
    (same kernel, parity-tested like label_propagation's fast path).
    """
    from ..hashing import hash64

    def canon(t: pa.Table) -> pa.Table:
        a = t[src_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        b = t[dst_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        keep = a != b
        a, b = a[keep], b[keep]
        return pa.table({"u": np.concatenate([a, b]),
                         "v": np.concatenate([b, a])})

    ed = edges.map_batches(canon, batch_format="pyarrow").materialize()
    n_edges = ed.count()
    import ray.data as rd

    empty = pa.table({"walk_id": pa.array([], pa.int64()),
                      "origin": pa.array([], pa.int64()),
                      "step": pa.array([], pa.int64()),
                      "node": pa.array([], pa.int64())})
    if n_edges == 0:
        return rd.from_arrow(empty)

    if n_edges <= local_edges_threshold:
        tbl = pa.concat_tables(_fetch_arrow_blocks(ed))
        u = tbl["u"].to_numpy(zero_copy_only=False).astype(np.int64)
        v = tbl["v"].to_numpy(zero_copy_only=False).astype(np.int64)
        # neighbor order must be canonical ((u, v)-sorted + DISTINCT),
        # not arrival order/multiplicity, or the hash pick would depend
        # on partitioning and duplicate edges would skew the choice
        o2 = np.lexsort((v, u))
        au, av = u[o2], v[o2]
        kd = np.r_[True, (au[1:] != au[:-1]) | (av[1:] != av[:-1])]
        au, av = au[kd], av[kd]
        origin = np.repeat(np.unique(u), walks_per_node)
        wid = (origin * walks_per_node
               + np.tile(np.arange(walks_per_node, dtype=np.int64),
                         len(np.unique(u))))
        out_w = [wid]
        out_s = [np.zeros(len(wid), np.int64)]
        out_n = [origin]
        cur = origin
        for s in range(walk_len):
            cur = _walk_step(au, av, wid, cur, s, seed)
            out_w.append(wid)
            out_s.append(np.full(len(wid), s + 1, np.int64))
            out_n.append(cur)
        return rd.from_arrow(pa.table({
            "walk_id": np.concatenate(out_w),
            "origin": np.repeat(origin[None, :], walk_len + 1, 0).reshape(-1),
            "step": np.concatenate(out_s),
            "node": np.concatenate(out_n),
        }))

    if num_buckets is None:
        num_buckets = int(max(8, min(256, n_edges // 50_000 + 8)))
        ed = ed.repartition(min(num_buckets, max(1, ed.num_blocks()))) \
               .materialize()

    def tag(col):
        def f(t: pa.Table) -> pa.Table:
            b = (hash64(t[col]) % np.uint64(num_buckets)).astype(np.int32)
            return t.append_column("__bucket", pa.array(b))
        return f

    def init_frontier(g: pd.DataFrame) -> pd.DataFrame:
        nodes = np.unique(g["u"].to_numpy(dtype=np.int64))
        origin = np.repeat(nodes, walks_per_node)
        wid = (origin * walks_per_node
               + np.tile(np.arange(walks_per_node, dtype=np.int64),
                         len(nodes)))
        return pd.DataFrame({"walk_id": wid, "origin": origin,
                             "node": origin})

    frontier = (
        ed.map_batches(tag("u"), batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(init_frontier, batch_format="pandas")
        .materialize()
    )
    steps = [frontier.map_batches(
        lambda t: t.append_column("step",
                                  pa.array(np.zeros(t.num_rows, np.int64))),
        batch_format="pyarrow")]

    def side(vv: int):
        def f(t: pa.Table) -> pa.Table:
            return t.append_column(
                "__side", pa.array([vv] * t.num_rows, pa.int8()))
        return f

    for s in range(walk_len):
        def advance(g: pd.DataFrame, s=s) -> pd.DataFrame:
            fr = g[g["__side"] == 1]
            eg = g[g["__side"] == 0]
            if fr.empty:
                return pd.DataFrame({
                    "walk_id": pd.Series([], dtype="int64"),
                    "origin": pd.Series([], dtype="int64"),
                    "node": pd.Series([], dtype="int64")})
            u = eg["u"].to_numpy(dtype=np.int64)
            v = eg["v"].to_numpy(dtype=np.int64)
            o = np.lexsort((v, u))
            au, av = u[o], v[o]
            kd = np.r_[True, (au[1:] != au[:-1]) | (av[1:] != av[:-1])]
            au, av = au[kd], av[kd]
            wid = fr["walk_id"].to_numpy(dtype=np.int64)
            cur = fr["node"].to_numpy(dtype=np.int64)
            nxt = _walk_step(au, av, wid, cur, s, seed)
            return pd.DataFrame({
                "walk_id": wid,
                "origin": fr["origin"].to_numpy(dtype=np.int64),
                "node": nxt})

        fr_tagged = frontier.map_batches(
            lambda t: t.append_column("u", t["node"]), batch_format="pyarrow"
        ).map_batches(side(1), batch_format="pyarrow")
        both = ed.map_batches(side(0), batch_format="pyarrow").union(fr_tagged)
        frontier = (
            both.map_batches(tag("u"), batch_format="pyarrow")
            .groupby("__bucket")
            .map_groups(advance, batch_format="pandas")
            .materialize()
        )
        steps.append(frontier.map_batches(
            lambda t, s=s: t.append_column(
                "step", pa.array(np.full(t.num_rows, s + 1, np.int64))),
            batch_format="pyarrow"))

    out = steps[0]
    for d in steps[1:]:
        out = out.union(d)
    return out.map_batches(
        lambda t: t.select(["walk_id", "origin", "step", "node"]),
        batch_format="pyarrow")


def k_core(edges, src_col: str, dst_col: str, k: int = 3,
           num_buckets: int | None = None, max_rounds: int = 100,
           local_edges_threshold: int = 200_000):
    """The k-core: the maximal subgraph where every node has degree ≥ k
    (Seidman 1983) — iterative peeling of sub-k nodes until fixed point.
    Returns ``(node:int64, degree:int64)`` rows of the surviving core
    (degree = within-core degree).  Distinct-neighbor degrees (parallel
    edges count once); self-loops ignored.

    Scale shape per round: ONE hash(u)-bucket degree reduce over the
    live canon edges, then the (node, alive) verdicts join back onto the
    edges by EACH endpoint (two more bucket exchanges); edges with a
    dead endpoint drop, and the loop ends when no node died (edge count
    fixed point — peeling is monotone).  Tiny graphs (≤ the threshold)
    run the same kernel on the driver like `label_propagation`."""
    from ..hashing import hash64

    def canon(t: pa.Table) -> pa.Table:
        a = t[src_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        b = t[dst_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        keep = a != b
        a, b = a[keep], b[keep]
        u = np.concatenate([a, b])
        v = np.concatenate([b, a])
        # distinct both-direction edge rows (degree counts neighbors once)
        o = np.lexsort((v, u))
        u, v = u[o], v[o]
        kd = np.r_[True, (u[1:] != u[:-1]) | (v[1:] != v[:-1])]
        return pa.table({"u": u[kd], "v": v[kd]})

    ed = edges.map_batches(canon, batch_format="pyarrow").materialize()
    n_edges = ed.count()
    import ray.data as rd

    empty = pa.table({"node": pa.array([], pa.int64()),
                      "degree": pa.array([], pa.int64())})
    if n_edges == 0:
        return rd.from_arrow(empty)

    if n_edges <= local_edges_threshold:
        import ray

        tbl = pa.concat_tables(_fetch_arrow_blocks(ed))
        u = tbl["u"].to_numpy(zero_copy_only=False).astype(np.int64)
        v = tbl["v"].to_numpy(zero_copy_only=False).astype(np.int64)
        # cross-block duplicates: canon deduped per batch only
        o = np.lexsort((v, u))
        u, v = u[o], v[o]
        kd = np.r_[True, (u[1:] != u[:-1]) | (v[1:] != v[:-1])]
        u, v = u[kd], v[kd]
        nodes = np.unique(u)
        cu = np.searchsorted(nodes, u)
        cv = np.searchsorted(nodes, v)
        ealive = np.ones(len(u), bool)
        for _ in range(max_rounds):
            deg = np.bincount(cu[ealive], minlength=len(nodes))
            nalive = deg >= k
            ne = nalive[cu] & nalive[cv]
            if ne.sum() == ealive.sum():
                break
            ealive = ne
        deg = np.bincount(cu[ealive], minlength=len(nodes))
        keep = deg >= k
        return rd.from_arrow(pa.table({
            "node": nodes[keep],
            "degree": deg[keep].astype(np.int64)}))

    if num_buckets is None:
        num_buckets = int(max(8, min(256, n_edges // 50_000 + 8)))
    # cross-block dedup of the canon rows: one (u-hash) bucket exchange
    def tag(col):
        def f(t: pa.Table) -> pa.Table:
            b = (hash64(t[col]) % np.uint64(num_buckets)).astype(np.int32)
            return t.append_column("__bucket", pa.array(b))
        return f

    def dedup_bucket(g: pd.DataFrame) -> pd.DataFrame:
        u = g["u"].to_numpy(dtype=np.int64)
        v = g["v"].to_numpy(dtype=np.int64)
        o = np.lexsort((v, u))
        u, v = u[o], v[o]
        kd = np.r_[True, (u[1:] != u[:-1]) | (v[1:] != v[:-1])]
        return pd.DataFrame({"u": u[kd], "v": v[kd]})

    ed = (
        ed.map_batches(tag("u"), batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(dedup_bucket, batch_format="pandas")
        .materialize()
    )
    prev = ed.count()

    def degrees(g: pd.DataFrame) -> pd.DataFrame:
        u = np.sort(g["u"].to_numpy(dtype=np.int64))
        starts = np.flatnonzero(np.r_[True, u[1:] != u[:-1]])
        cnt = np.diff(np.append(starts, len(u)))
        return pd.DataFrame({"node": u[starts],
                             "degree": cnt.astype(np.int64)})

    def side(vv: int):
        def f(t: pa.Table) -> pa.Table:
            return t.append_column(
                "__side", pa.array([vv] * t.num_rows, pa.int8()))
        return f

    def filter_by(col):
        def fb(g: pd.DataFrame) -> pd.DataFrame:
            alive = g[g["__side"] == 1]
            eg = g[g["__side"] == 0]
            if eg.empty:
                return pd.DataFrame({"u": pd.Series([], dtype="int64"),
                                     "v": pd.Series([], dtype="int64")})
            an = np.sort(alive["node"].to_numpy(dtype=np.int64))
            c = eg[col].to_numpy(dtype=np.int64)
            pos = np.searchsorted(an, c)
            ok = (pos < len(an)) & (an[np.minimum(pos, len(an) - 1)] == c)
            return pd.DataFrame({"u": eg["u"].to_numpy(dtype=np.int64)[ok],
                                 "v": eg["v"].to_numpy(dtype=np.int64)[ok]})
        return fb

    for _ in range(max_rounds):
        deg = (
            ed.map_batches(tag("u"), batch_format="pyarrow")
            .groupby("__bucket")
            .map_groups(degrees, batch_format="pandas")
        )
        # materialize the (small) verdict set: consuming it lazily from
        # BOTH endpoint joins would nest its groupby inside each join's
        # execution — two concurrent all-to-all aggregator pools deadlock
        # under tight CPU budgets (CLAUDE.md measured pitfall)
        alive = deg.map_batches(
            lambda t: t.filter(pc.greater_equal(t["degree"],
                                                pa.scalar(k, pa.int64())))
                       .select(["node"]),
            batch_format="pyarrow").materialize()
        for col in ("u", "v"):
            al = alive.map_batches(
                lambda t, c=col: t.append_column(c, t["node"]),
                batch_format="pyarrow",
            ).map_batches(side(1), batch_format="pyarrow")
            both = ed.map_batches(side(0), batch_format="pyarrow").union(al)
            ed = (
                both.map_batches(tag(col), batch_format="pyarrow")
                .groupby("__bucket")
                .map_groups(filter_by(col), batch_format="pandas")
                .materialize()
            )
        cur = ed.count()
        if cur == prev:
            break
        prev = cur
    return (
        ed.map_batches(tag("u"), batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(degrees, batch_format="pandas")
    )


def hits(edges, src_col: str, dst_col: str, iters: int = 20,
         max_nodes: int = 1_000_000_000,
         local_edges_threshold: int = 200_000):
    """HITS hubs-and-authorities (Kleinberg 1999) by the same
    broadcast-pull block-fold shape as ``pagerank``: directed edges stay
    distributed and index ONCE against the broadcast sorted node-id
    vector; each of ``iters`` rounds broadcasts the current (hub, auth)
    float64 vectors, one ray task per materialized edge block returns
    BOTH dense contribution partials (auth' gathers hub over incoming
    edges, hub' gathers auth over outgoing — a single pass per block),
    and the driver folds + L2-normalizes.  No per-round Dataset
    execution; O(nodes) driver/worker state under the same ``max_nodes``
    guard as pagerank.  Output: ``(node, hub, authority)``, each vector
    L2-normalized (the standard convention; deterministic for a fixed
    iteration count — power iteration on AᵀA / AAᵀ)."""
    import ray
    import ray.data as rd

    import pyarrow.compute as _pc

    from .join import _bcast_get

    def canon(t: pa.Table) -> pa.Table:
        return pa.table({
            "src": _pc.cast(t[src_col], pa.int64()),
            "dst": _pc.cast(t[dst_col], pa.int64()),
        })

    e = edges.map_batches(canon, batch_format="pyarrow").materialize()

    def _iterate(contrib, n, rounds):
        """Shared per-round math (ONE copy for both paths): ``contrib``
        maps the current (h, a) to the raw (a_new, h_new) partial sums;
        normalization/zero-norm handling lives only here, so the
        local and distributed paths can never desynchronize."""
        h = np.full(n, 1.0 / np.sqrt(n)) if n else np.empty(0)
        a = h.copy()
        for _ in range(rounds):
            a_new, h_new = contrib(h, a)
            na = np.linalg.norm(a_new)
            nh = np.linalg.norm(h_new)
            a = a_new / na if na else a_new
            h = h_new / nh if nh else h_new
        return h, a

    if 0 < local_edges_threshold and e.count() <= local_edges_threshold:
        blocks = _fetch_arrow_blocks(e)
        tbl = (pa.concat_tables(blocks) if blocks
               else pa.table({"src": pa.array([], pa.int64()),
                              "dst": pa.array([], pa.int64())}))
        src = tbl["src"].to_numpy(zero_copy_only=False)
        dst = tbl["dst"].to_numpy(zero_copy_only=False)
        node_ids = np.unique(np.concatenate([src, dst]))
        n = len(node_ids)
        if n > max_nodes:
            raise ValueError(
                f"hits holds O(nodes) hub/auth state; {n} nodes exceeds "
                f"max_nodes={max_nodes}")
        si = np.searchsorted(node_ids, src)
        di = np.searchsorted(node_ids, dst)

        def local_contrib(hv, av):
            return (np.bincount(di, weights=hv[si], minlength=n),
                    np.bincount(si, weights=av[di], minlength=n))

        h, a = _iterate(local_contrib, n, int(iters))
        return rd.from_arrow(pa.table({
            "node": pa.array(node_ids, pa.int64()),
            "hub": pa.array(h, pa.float64()),
            "authority": pa.array(a, pa.float64()),
        }))

    # distributed: node-id collect (bounded by guard) + per-block folds
    def id_rows(t: pa.Table) -> pa.Table:
        u = np.unique(np.concatenate([
            t["src"].to_numpy(zero_copy_only=False),
            t["dst"].to_numpy(zero_copy_only=False)]))
        return pa.table({"node": pa.array(u, pa.int64())})

    from .dedup import bucketed_distinct

    nd = bucketed_distinct(
        e.map_batches(id_rows, batch_format="pyarrow"), ["node"],
        num_buckets=64).materialize()
    n = nd.count()
    if n > max_nodes:
        raise ValueError(
            f"hits holds O(nodes) hub/auth state; {n} nodes exceeds "
            f"max_nodes={max_nodes}")
    node_ids = np.sort(np.concatenate([
        t["node"].to_numpy(zero_copy_only=False)
        for t in _fetch_arrow_blocks(nd)])) if n else np.empty(0, np.int64)
    ids_ref = ray.put(node_ids)

    def to_idx(t: pa.Table) -> pa.Table:
        ids = _bcast_get(ids_ref)
        return pa.table({
            "si": np.searchsorted(ids, t["src"].to_numpy()),
            "di": np.searchsorted(ids, t["dst"].to_numpy()),
        })

    e_idx = e.map_batches(to_idx, batch_format="pyarrow").materialize()

    @ray.remote
    def _block_contrib(t: pa.Table, hv, av, nn: int):
        si = t["si"].to_numpy()
        di = t["di"].to_numpy()
        return (np.bincount(di, weights=hv[si], minlength=nn),
                np.bincount(si, weights=av[di], minlength=nn))

    block_refs = e_idx.to_arrow_refs()

    def dist_contrib(hv, av):
        hr, ar = ray.put(hv), ray.put(av)
        parts = ray.get([
            _block_contrib.remote(b, hr, ar, n) for b in block_refs])
        a_new = (np.sum([p[0] for p in parts], axis=0)
                 if parts else np.zeros(n))
        h_new = (np.sum([p[1] for p in parts], axis=0)
                 if parts else np.zeros(n))
        return a_new, h_new

    h, a = _iterate(dist_contrib, n, int(iters))
    return rd.from_arrow(pa.table({
        "node": pa.array(node_ids, pa.int64()),
        "hub": pa.array(h, pa.float64()),
        "authority": pa.array(a, pa.float64()),
    }))
