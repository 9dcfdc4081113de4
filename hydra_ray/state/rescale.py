"""Offline streaming-state rescale: repartition committed state N → M.

The partition count is SEMANTIC state layout (keys route by
``hash(key) % P``), so a deployment cannot simply restart with a
different ``num_partitions`` — every piece of keyed operator state
would sit on the wrong actor.  This is the savepoint-rescale operation
of mainstream streaming engines (Flink repartitions key groups on
restore from a savepoint): run between jobs, it rewrites the last
committed checkpoint for a new partition count, after which
``ReplicatePipeline`` resumes normally and — because streaming
semantics here are routing-independent by construction (CLAUDE.md
invariant; the salting tests enforce it) — produces byte-identical
outputs.

Shape (all heavy work in Ray tasks, scatter/gather by partition):

1. SPLIT, one task per OLD partition: restore its chain
   (full + deltas), split every state component by the NEW home
   ``partition_for(key, new_P)``, write one shard file per touched new
   partition.
2. MERGE, one task per NEW partition: fold its shard files into a
   fresh ``PartitionState`` and save ONE full checkpoint at the
   committed epoch.  Merge rules mirror the live operators:
   window partials add (a salted hot key's partials live on several
   old partitions); sessions gap-merge (`_merge_session_range`);
   the compacted view takes last-write-wins by (ts, rev); buffered
   updates concatenate then dedup by (key, ts, rev) (hot-key fan-out
   replicas are exact copies); clip/funnel buffers are disjoint row
   sets and concatenate.
3. COMMIT: the new checkpoints live in a fresh LAYOUT GENERATION dir
   (``_checkpoints/<gen-…>/p*``) and the main sink's pipeline state
   records ``{"num_partitions": M, "ckpt_layout": "<gen-…>"}`` in ONE
   atomic manifest append — the single commit point, no renames (the
   protocol runs unchanged on object storage).  ``run()`` resolves the
   active layout from committed state.  Dedup/near-dup shard tiers
   (``d*``/``n*`` dirs) are keyed by content hash, independent of
   ``num_partitions``, and stay at the checkpoint root untouched.

Crash safety: the old layout is NEVER touched — a crash anywhere before
the state commit leaves an orphan generation dir (harmless; re-run the
rescale).  Rollback is pure metadata: point ``ckpt_layout`` /
``num_partitions`` back at the previous generation via
``update_pipeline_state`` — no file moves in either direction.
"""

from __future__ import annotations

import os
import pickle
import uuid
from collections import defaultdict

import numpy as np
import pyarrow as pa

from ..hashing import partition_for
from .store import PartitionState, _fold_window_cell, find_restore_chain

__all__ = ["rescale_state"]


def _empty_shard() -> dict:
    return {"win": {}, "swin": {}, "sessions": {}, "view": {},
            "upd": [], "clips": [], "funnel": {}, "funnel_buf": []}


def _split_one(ckpt_root: str, p: int, epoch: int, cfg, new_p: int,
               tmp_root: str) -> dict:
    """Restore old partition ``p`` and write one shard file per new
    partition that receives any of its state."""
    st = PartitionState(p, cfg)
    chain = find_restore_chain(os.path.join(ckpt_root, f"p{p:04d}"), epoch)
    if chain is None:
        raise RuntimeError(
            f"no restorable checkpoint chain for partition {p} at epoch {epoch}"
        )
    st.restore_chain(*chain)

    shards: dict[int, dict] = {}

    def shard(q: int) -> dict:
        return shards.setdefault(q, _empty_shard())

    # one vectorized home lookup for every distinct key in the dicts
    keyed = set()
    for kw in st.win:
        keyed.add(kw[0])
    for kw in st.swin:
        keyed.add(kw[0])
    keyed.update(st.sessions)
    keyed.update(st.view)
    keyed.update(st.funnel)
    homes: dict = {}
    if keyed:
        ks = np.array(sorted(keyed), dtype=object)
        homes = dict(zip(ks, partition_for(ks, new_p)))

    for kw, acc in st.win.items():
        shard(int(homes[kw[0]]))["win"][kw] = acc
    for kw, acc in st.swin.items():
        shard(int(homes[kw[0]]))["swin"][kw] = acc
    for k, lst in st.sessions.items():
        shard(int(homes[k]))["sessions"][k] = lst
    for k, rec in st.view.items():
        shard(int(homes[k]))["view"][k] = rec
    for k, chain_times in st.funnel.items():
        shard(int(homes[k]))["funnel"][k] = chain_times

    for t in st.clip_buf:
        if not t.num_rows:
            continue
        qs = partition_for(t["clip_id"], new_p)
        for q in np.unique(qs):
            shard(int(q))["clips"].append(t.filter(pa.array(qs == q)))

    ukeys, uts, urev, utext = st._consolidated_updates()
    if len(ukeys):
        qs = partition_for(ukeys, new_p)
        for q in np.unique(qs):
            m = qs == q
            shard(int(q))["upd"].append((ukeys[m], uts[m], urev[m], utext[m]))

    for fk, ft, fd in st.funnel_buf:
        if not len(fk):
            continue
        qs = partition_for(fk, new_p)
        for q in np.unique(qs):
            m = qs == q
            shard(int(q))["funnel_buf"].append((fk[m], ft[m], fd[m]))

    from ..fs import fput

    for q, d in shards.items():
        # create_or_skip: a Ray task retry (worker death) re-PUTs
        # deterministic shard content — skipping the existing complete
        # object is correct, raising would abort the whole rescale
        fput(
            os.path.join(tmp_root, "_shards", f"q{q:04d}",
                         f"from_p{p:04d}.pkl"),
            pickle.dumps(d, protocol=pickle.HIGHEST_PROTOCOL),
            mode="create_or_skip",
        )
    return {"max_ts": st.max_ts, "metrics": dict(st.metrics)}


def _merge_one(q: int, tmp_root: str, epoch: int, cfg, max_ts: int,
               metrics: dict, wm: int | None) -> str:
    """Fold new partition ``q``'s shard files into one full checkpoint."""
    from ..fs import fget, flist

    st = PartitionState(q, cfg)
    qdir = os.path.join(tmp_root, "_shards", f"q{q:04d}")
    gap = getattr(cfg, "session_gap_ms", 0)
    for name in flist(qdir):
        d = pickle.loads(fget(os.path.join(qdir, name)))
        # salted hot key: partials from several old partitions fold with
        # the one shared cell rule (handles the window_sample_k and
        # window_distinct_k cells too)
        sample_k = getattr(cfg, "window_sample_k", 0)
        distinct_k = getattr(cfg, "window_distinct_k", 0)
        mode_k = getattr(cfg, "window_mode_k", 0)
        top_k = getattr(cfg, "window_top_k", 0)
        for target, delta in ((st.win, d["win"]), (st.swin, d["swin"])):
            for kw, acc in delta.items():
                _fold_window_cell(target, kw, acc, sample_k, distinct_k,
                                  mode_k, top_k)
        for k, lst in d["sessions"].items():
            for s in lst:
                if len(s) > 5:
                    st._merge_session_range(k, s[0], s[1], s[2], s[3], gap,
                                            hs_s=s[4], vs_s=s[5])
                else:
                    st._merge_session_range(k, s[0], s[1], s[2], s[3], gap)
        for k, rec in d["view"].items():
            cur = st.view.get(k)
            if cur is None or (rec[0], rec[1]) >= (cur[0], cur[1]):
                st.view[k] = rec
        st.upd_chunks.extend(d["upd"])
        st.clip_buf.extend(d["clips"])
        st.funnel.update(d["funnel"])          # funnel rows route home: disjoint
        st.funnel_buf.extend(d["funnel_buf"])
    # hot-key fan-out replicated the same update to several partitions;
    # after re-homing, copies meet — dedup by (key, ts, rev)
    ukeys, uts, urev, utext = st._consolidated_updates()
    if len(ukeys):
        dup = np.zeros(len(ukeys), dtype=bool)
        dup[1:] = (ukeys[1:] == ukeys[:-1]) & (uts[1:] == uts[:-1]) & (
            urev[1:] == urev[:-1])
        keep = ~dup
        st.upd_chunks = [(ukeys[keep], uts[keep], urev[keep], utext[keep])]
    st.max_ts = max_ts
    st.metrics = defaultdict(int, metrics)
    out = os.path.join(tmp_root, f"p{q:04d}", f"e{epoch:06d}")
    st.save(out, wm=wm, full=True)
    return out


def rescale_state(out_root: str, new_num_partitions: int, cfg,
                  name: str = "replicate") -> dict:
    """Rewrite the last committed checkpoint of the pipeline at
    ``out_root`` for ``new_num_partitions`` partitions.  ``cfg`` is the
    run's ``ReplicateConfig`` (window/join/session parameters must match
    the committed run — they shape the state being carried).  Returns a
    summary dict; afterwards resume with
    ``ReplicateConfig(num_partitions=new_num_partitions, ...)``."""
    import ray

    from ..pipelines.replicate import _StateCfg
    from ..table import Table

    from ..fs import flist, resolve

    main = Table(os.path.join(out_root, "replicated"))
    state = main.pipeline_state(name)
    committed = int(state.get("last_epoch", -1))
    if committed < 0:
        raise ValueError(f"no committed epoch for pipeline {name!r} at {out_root}")
    ckpt_root = os.path.join(out_root, "_checkpoints")
    old_layout = str(state.get("ckpt_layout", "") or "")
    old_root = (
        os.path.join(ckpt_root, old_layout) if old_layout else ckpt_root
    )
    old_p = int(state.get("num_partitions", 0))
    if not old_p:  # older runs didn't record it: count checkpoint dirs
        old_p = sum(
            1 for d in flist(old_root)
            if d.startswith("p") and d[1:].isdigit()
        )
    new_p = int(new_num_partitions)
    if new_p < 1:
        raise ValueError("new_num_partitions must be ≥ 1")
    if new_p == old_p:
        return {"epoch": committed, "old": old_p, "new": new_p, "noop": True}
    wm_raw = state.get("watermark")
    wm = int(wm_raw) if wm_raw is not None else None
    scfg = _StateCfg(cfg)

    # fresh layout generation; the nonce makes re-runs after a crash
    # collision-free (an orphan generation dir is harmless garbage)
    layout = f"gen-e{committed:06d}-P{new_p}-{uuid.uuid4().hex[:8]}"
    new_root = os.path.join(ckpt_root, layout)

    split = ray.remote(_split_one)
    infos = ray.get([
        split.remote(old_root, p, committed, scfg, new_p, new_root)
        for p in range(old_p)
    ])
    max_ts = max(i["max_ts"] for i in infos)
    merged_metrics: dict = {}
    for i in infos:
        for k, v in i["metrics"].items():
            merged_metrics[k] = merged_metrics.get(k, 0) + v

    merge = ray.remote(_merge_one)
    # per-partition metrics cannot be split by key; totals (what the
    # commit merges/reports) ride on new partition 0
    ray.get([
        merge.remote(q, new_root, committed, scfg, max_ts,
                     merged_metrics if q == 0 else {}, wm)
        for q in range(new_p)
    ])

    # THE commit point: one atomic manifest append records both the new
    # count and the layout pointer — before it the old layout is fully
    # live; after it run() resolves the new one.  No renames anywhere.
    main.update_pipeline_state(
        name,
        {"num_partitions": new_p, "ckpt_layout": layout},
    )
    # scratch shard objects are no longer needed
    fs_i, shards_dir = resolve(os.path.join(new_root, "_shards"))
    fs_i.delete_tree(shards_dir)
    return {"epoch": committed, "old": old_p, "new": new_p,
            "layout": layout, "previous_layout": old_layout}
