"""Per-partition state stores: windows, symmetric-hash join, compacted view.

This is the stateful core of the streaming engine — the Ray-native
replacement for the reference's in-memory ``Ref``-map materialized views
(`ingestors/kafka/.../algebras/MetadataAlgebra.scala:36-118`,
`ConsumerGroupsAlgebra.scala:254-325`) and the graft's new CEP operators
(BASELINE.json north_star): tumbling/sliding/session windows, event-time
watermarks, and a symmetric-hash stream-stream join of the clip stream
against the transcript-update stream.

One ``PartitionStateActor`` exists per partition (``hash(clip_id) % P``,
`hydra_ray.hashing`).  Stateless ``map_batches`` tasks route each batch's
per-partition slices to the owning actor; the driver advances the
event-time watermark per epoch and calls ``close_epoch``, which

- emits **replicated** clips whose join horizon has passed
  (``wm ≥ clip.event_ts + join_window``), enriched with the latest
  matching transcript revision (tombstone ⇒ ``deleted=True`` — compacted
  null-payload delete semantics,
  `core/src/main/scala/hydra/core/ingest/HydraRequest.scala:13-14`);
- closes windows whose end ≤ watermark;
- routes late rows (event_ts < watermark at arrival) to the DLQ output
  (the reference's error topic,
  `.../ingestors/IngestionErrorHandler.scala:22-91`);
- evicts join/window state below the watermark;
- stages its output fragments into the sink tables (phase 1 of the 2PC in
  `hydra_ray.table.lancelite`), returning fragment metadata + metrics.

**Determinism contract**: all operator semantics depend only on
(event_ts, revision/seq) — never on arrival order — so any replay of the
same input slices + watermark sequence produces identical output rows.
That is what makes the idempotent epoch commit exactly-once end to end.

State is checkpointed per epoch: light state (window partials, open
sessions, update buffer, compacted view, metrics) as a pickle, the
buffered clip table (with PCM payloads) as parquet.  Resume loads the
checkpoint of the last committed epoch and replays source deltas after it.
"""

from __future__ import annotations

import os
import pickle
from collections import defaultdict

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..stages.windows import assign_tumbling, ts_to_ms

WATERMARK_MAX = (1 << 62)  # end-of-stream sentinel: flush everything
_I64MAX = np.iinfo(np.int64).max  # funnel chain: "step not reached"

__all__ = ["PartitionState", "PartitionStateActor", "WATERMARK_MAX"]


def _bottomk_union(h1, v1, h2, v2, k: int):
    """Merge two bottom-k-by-hash samples: union, dedup by hash (makes
    ingest replay idempotent — hashes are unique per record), keep the k
    smallest.  Associative + commutative + idempotent ⇒ the sample is
    identical under any routing (salting), any epoch split (deltas) and
    any N→M rescale fold."""
    h = np.concatenate([h1, h2])
    v = np.concatenate([v1, v2])
    hh, ui = np.unique(h, return_index=True)       # sorted ascending
    return hh[:k], v[ui][:k]


def _kmv_union(c1, c2, k: int):
    """Merge two KMV (k-minimum-values) distinct sketches: union, dedup
    (``np.unique``), keep the k smallest hashes.  Same monoid laws as
    ``_bottomk_union`` — dedup makes replay idempotent, union makes it
    routing/salting/rescale-independent.  Below k distinct hashes the
    sketch IS the exact distinct set."""
    return np.unique(np.concatenate([c1, c2]))[:k]


def _kmv_estimate(ch: np.ndarray, k: int, n_cap: int | None = None) -> int:
    """Distinct-count from a KMV sketch (Bar-Yossef et al. 2002): exact
    ``len(ch)`` while the sketch never overflowed (< k entries), else
    ``(k−1)/v_k`` with ``v_k`` the k-th smallest normalized hash.
    ``n_cap`` (the cell's exact row count) clamps the estimator's
    overshoot — distinct can never exceed rows, and the cap is itself a
    routing-independent exact partial, so determinism is preserved."""
    m = len(ch)
    if k <= 0 or m < k:
        return m
    vk = float(ch[k - 1]) / 2.0 ** 64        # ch is sorted ascending
    if vk <= 0.0:
        return m
    est = max(m, int(round((k - 1) / vk)))
    return min(est, n_cap) if n_cap is not None else est


def _modek_union(h1, c1, h2, c2, k: int):
    """Merge two bottom-k-by-content-hash COUNT samples: union by hash,
    SUM counts on the intersection, keep the k smallest hashes.  Counts
    stay EXACT for every hash that survives: a hash in the merged
    bottom-k has < k smaller distinct hashes in the union, hence < k in
    every partial's (subset) view too — so each partial that saw it kept
    its full local count.  Associative + commutative (counts are
    additive partials like cnt/sum — replay safety comes from the
    checkpoint-rebuild model, exactly as for the count column), so the
    sample is identical under any routing/salting, epoch split and
    N→M rescale fold."""
    h = np.concatenate([h1, h2])
    c = np.concatenate([c1, c2]).astype(np.int64)
    hh, inv = np.unique(h, return_inverse=True)    # sorted ascending
    cc = np.zeros(len(hh), np.int64)
    np.add.at(cc, inv, c)
    return hh[:k], cc[:k]


def _topk_union(v1, h1, v2, h2, k: int):
    """Merge two top-k-by-VALUE record samples (value desc, hash-of-seq
    ascending tie-break): union, dedup by hash (replay idempotence —
    hashes are unique per record), keep the k largest.  A record in the
    union's top-k has < k larger records in every partial's (subset)
    view, so each partial kept it — union-of-top-k ⊇ top-k-of-union
    makes the result EXACT.  Associative + commutative + idempotent ⇒
    identical under any routing/salting, epoch split and rescale fold."""
    h = np.concatenate([h1, h2])
    v = np.concatenate([v1, v2])
    hh, ui = np.unique(h, return_index=True)
    vv = v[ui]
    order = np.lexsort((hh, -vv))[:k]
    return vv[order], hh[order]


def _mode_of(mh: np.ndarray, mc: np.ndarray) -> tuple[int, int]:
    """(content hash, exact count) of the most frequent content in the
    sample; count ties break to the smallest hash (``mh`` is sorted
    ascending, so the first argmax wins).  Exact mode whenever the
    cell's distinct content ≤ k (same regime where the KMV distinct
    count is exact); beyond that it is the mode of a deterministic
    uniform sample of the distinct contents."""
    if len(mh) == 0:
        return 0, 0
    j = int(np.argmax(mc))
    return int(mh[j]), int(mc[j])


def _fold_window_cell(target: dict, kw, acc, k: int, dk: int = 0,
                      mk: int = 0, tk: int = 0):
    """Fold one (key, window) partial into a state dict — the ONE merge
    rule shared by live ingest, delta-checkpoint replay and rescale.
    Cell layout is positional, driven by the cfg flags: [cnt, sum]
    (+ [hs, vs] with window_sample_k) (+ [ch] with window_distinct_k)
    (+ [mh, mc] with window_mode_k) (+ [tv, th] with window_top_k).
    Toggling a flag mid-checkpoint-chain is not supported (a restored
    short cell is extended on first fold; a reinterpreted one is not
    detected)."""
    cur = target.get(kw)
    if cur is None:
        target[kw] = [a.copy() if isinstance(a, np.ndarray) else a for a in acc]
        return
    cur[0] += acc[0]
    cur[1] += acc[1]
    i = 2
    if k and len(acc) > i + 1:
        if len(cur) > i + 1:
            cur[i], cur[i + 1] = _bottomk_union(
                cur[i], cur[i + 1], acc[i], acc[i + 1], k)
        else:
            cur.extend([acc[i].copy(), acc[i + 1].copy()])
        i += 2
    if dk and len(acc) > i:
        if len(cur) > i:
            cur[i] = _kmv_union(cur[i], acc[i], dk)
        else:
            cur.append(acc[i].copy())
        i += 1
    if mk and len(acc) > i + 1:
        if len(cur) > i + 1:
            cur[i], cur[i + 1] = _modek_union(
                cur[i], cur[i + 1], acc[i], acc[i + 1], mk)
        else:
            cur.extend([acc[i].copy(), acc[i + 1].copy()])
        i += 2
    if tk and len(acc) > i + 1:
        if len(cur) > i + 1:
            cur[i], cur[i + 1] = _topk_union(
                cur[i], cur[i + 1], acc[i], acc[i + 1], tk)
        else:
            cur.extend([acc[i].copy(), acc[i + 1].copy()])


def _sample_quantiles(vs: np.ndarray) -> tuple[int, int]:
    """(p50, p90) by the discrete nearest-rank rule quantile_disc uses:
    index = ceil(p·n) − 1 over the ascending values."""
    v = np.sort(np.asarray(vs, dtype=np.int64))
    n = len(v)
    if n == 0:
        return 0, 0
    i50 = min(n - 1, max(0, -(-n // 2) - 1))       # ceil(0.5 n) − 1
    i90 = min(n - 1, max(0, -(-(9 * n) // 10) - 1))
    return int(v[i50]), int(v[i90])


def _update_keep_mask(keys: np.ndarray, tss: np.ndarray, horizon: int,
                      temporal: bool) -> np.ndarray:
    """Eviction predicate over (key, ts, rev)-SORTED update state: drop
    rows below the horizon — except, under the temporal (as-of) join,
    the LATEST below-horizon row of each key, which remains the valid
    as-of version for every future clip until a newer version itself
    passes the horizon.  Monotone in the watermark either way (a row
    evicted at wm₁ is evicted from the full set at any wm₂ > wm₁), so
    full+delta checkpoint replay pruned at the final watermark is exact.
    """
    keep = tss >= horizon
    if temporal and not keep.all():
        below = ~keep
        last_below = below.copy()
        if len(keys) > 1:
            # within a key run ts ascends, so below-horizon rows are a
            # prefix: the run's last below row has no below successor
            last_below[:-1] &= ~((keys[1:] == keys[:-1]) & below[1:])
        keep |= last_below
    return keep


class PartitionState:
    """Pure-python state container (actor-agnostic; unit-testable)."""

    def __init__(self, partition: int, cfg):
        self.partition = partition
        self.cfg = cfg
        # tumbling window partials: (clip_id, window_start) -> [cnt, sum_dur_ms]
        self.win: dict[tuple[str, int], list] = {}
        # sliding window partials (same layout; rows explode ×k at ingest)
        self.swin: dict[tuple[str, int], list] = {}
        # open sessions: clip_id -> sorted list of [start, end, cnt, sum_dur]
        self.sessions: dict[str, list] = defaultdict(list)
        # join left side: pending decoded clip batches (arrow, light columns)
        self.clip_buf: list[pa.Table] = []
        # join right side: columnar update chunks (keys, ts, rev, transcript)
        # — consolidated/sorted at close, evicted below the join horizon
        self.upd_chunks: list[tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]] = []
        # compacted latest-transcript view (last-write-wins by (ts, rev))
        self.view: dict[str, tuple] = {}
        # CEP funnel: key -> list of achieved chain times (earliest-
        # completion chain over the combined clip/update/delete stream);
        # buffered not-yet-processed light rows as (keys, ts, kind) arrays
        self.funnel: dict[str, list] = {}
        self.funnel_buf: list[tuple[np.ndarray, np.ndarray, np.ndarray]] = []
        # DLQ rows accumulated this epoch: list[(source, reason, table)]
        self.dlq_buf: list[tuple[str, str, pa.Table]] = []
        # CDC changelog bookkeeping: key -> view record as of the EPOCH
        # START, recorded the first time the key's view entry is replaced
        # within the epoch.  Lives entirely inside one ingest→close cycle
        # (emitted and cleared at close_epoch), so it is never part of a
        # checkpoint — a resume replays the epoch's ingests and rebuilds it.
        self._chg_prev: dict[str, tuple | None] = {}
        # per-epoch clip-key counts (reset each close) — feeds the driver's
        # sticky hot-key detection; bounded by the report cap, not by rows
        self.key_counts: dict[str, int] = {}
        # keys whose open sessions changed since the last close (early-
        # fire sessions tier; transient — cleared at every close, never
        # checkpointed: a restore replays the epoch's ingests anyway)
        self._touched_sessions: set = set()
        self.max_ts = -(1 << 62)
        self.metrics = defaultdict(int)
        # deltas since the last checkpoint (incremental-checkpoint support:
        # full snapshot every K epochs, O(delta) in between — restore
        # merges full + deltas then prunes by the final watermark, which
        # is exact because every removal predicate is wm-monotone)
        self._reset_deltas()

    def _reset_deltas(self):
        self._delta_win: dict[tuple[str, int], list] = {}
        self._delta_swin: dict[tuple[str, int], list] = {}
        self._delta_upd: list[tuple] = []
        self._delta_view: dict[str, tuple] = {}
        self._delta_clips: list[pa.Table] = []
        self._delta_funnel: dict[str, list] = {}
        self._delta_funnel_buf: list[tuple] = []

    # ------------------------------------------------------------- ingest
    def ingest_clips(self, table: pa.Table, wm: int) -> dict:
        n = table.num_rows
        if n == 0:
            return {"n": 0, "late": 0, "max_ts": self.max_ts}
        ts = ts_to_ms(table["event_ts"])
        self.max_ts = max(self.max_ts, int(ts.max()))

        err_idx = table.schema.get_field_index("decode_error")
        if err_idx >= 0:
            bad = pc.is_valid(table["decode_error"]).to_numpy(zero_copy_only=False)
        else:
            bad = np.zeros(n, dtype=bool)
        if table.schema.get_field_index("__filtered") >= 0:
            # curation-gate drops marked by the routing task's
            # payload_filter pass (decode-ok rows only by construction)
            filt = table["__filtered"].to_numpy(
                zero_copy_only=False).astype(bool) & ~bad
            table = table.drop_columns(["__filtered"])
        else:
            filt = np.zeros(n, dtype=bool)
        late = (ts < wm) & ~bad & ~filt
        ok = ~late & ~bad & ~filt

        if bad.any():
            self.dlq_buf.append(
                ("clips", "decode_error", _drop_heavy(table.filter(pa.array(bad))))
            )
            self.metrics["clips_decode_error"] += int(bad.sum())
        if filt.any():
            self.dlq_buf.append(
                ("clips", "filtered", _drop_heavy(table.filter(pa.array(filt))))
            )
            self.metrics["clips_filtered"] += int(filt.sum())
        if late.any():
            self.dlq_buf.append(
                ("clips", "late", _drop_heavy(table.filter(pa.array(late))))
            )
            self.metrics["clips_late"] += int(late.sum())

        if ok.any():
            sub = table.filter(pa.array(ok))
            if err_idx >= 0:
                sub = sub.drop_columns(["decode_error"])
            # content_h is a window-state input only (KMV distinct
            # sketch): strip it before the row buffers so it never leaks
            # into the replicated output schema or checkpoint buffers
            ch = None
            if sub.schema.get_field_index("content_h") >= 0:
                ch = sub["content_h"].to_numpy(
                    zero_copy_only=False).astype(np.uint64)
                sub = sub.drop_columns(["content_h"])
            self.clip_buf.append(sub)
            self._delta_clips.append(sub)
            sub_ts = ts[ok]
            self._accumulate_windows(sub, sub_ts, ch)
            vc = sub.group_by(["clip_id"], use_threads=False).aggregate(
                [("clip_id", "count")]
            )
            cnts = vc["clip_id_count"].to_numpy(zero_copy_only=False)
            heavy = cnts >= 2  # a hot key recurs within a batch; cold keys don't
            for k, c in zip(
                np.asarray(vc["clip_id"].to_numpy(zero_copy_only=False), object)[heavy],
                cnts[heavy],
            ):
                self.key_counts[k] = self.key_counts.get(k, 0) + int(c)
            self.metrics["clips_in"] += sub.num_rows
            if getattr(self.cfg, "funnel_steps", ()):
                # funnel events for clips whose HOME partition is this one;
                # salted-away hot clips arrive via the router's explicit
                # kind="funnel" sends (funnel state is per-key sequential,
                # never salted — the rows are 3 light columns)
                from ..hashing import partition_for

                kk = np.asarray(
                    sub["clip_id"].to_numpy(zero_copy_only=False), dtype=object
                )
                home = partition_for(kk, self.cfg.num_partitions) == self.partition
                if home.any():
                    self._funnel_append(
                        kk[home], sub_ts[home],
                        np.zeros(int(home.sum()), np.int8),
                    )
        return {"n": n, "late": int(late.sum()), "max_ts": self.max_ts}

    def ingest_funnel(self, table: pa.Table, wm: int) -> dict:
        """Light (clip_id, event_ts) rows fan-routed to the HOME partition
        for clips whose salted route landed elsewhere (pre-filtered to the
        same will-emit predicate ``ingest_clips`` applies)."""
        n = table.num_rows
        if n == 0:
            return {"n": 0, "late": 0, "max_ts": self.max_ts}
        ts = ts_to_ms(table["event_ts"])
        keys = np.asarray(table["clip_id"].to_numpy(zero_copy_only=False), object)
        self._funnel_append(keys, ts, np.zeros(n, np.int8))
        return {"n": n, "late": 0, "max_ts": self.max_ts}

    def _funnel_append(self, keys: np.ndarray, tss: np.ndarray, kinds: np.ndarray):
        chunk = (keys, tss.astype(np.int64), kinds)
        self.funnel_buf.append(chunk)
        self._delta_funnel_buf.append(chunk)

    @staticmethod
    def _merge_window_partials(
        targets: list[dict], keys_np: np.ndarray, starts: np.ndarray,
        durs: np.ndarray, hs: np.ndarray | None = None, sample_k: int = 0,
        ch: np.ndarray | None = None, distinct_k: int = 0,
        mode_k: int = 0, top_k: int = 0,
    ):
        """Fold per-batch (key, window) partials into the given state dicts
        (live dict + checkpoint-delta dict).

        One C-side ``pa.Table.group_by`` collapses the batch first, so the
        Python merge loop runs once per DISTINCT (key, window) of the
        batch — O(keys·windows), not O(rows); hot keys collapse hardest.
        With ``sample_k`` set the collapse also keeps each group's k
        smallest-``hs`` rows (one lexsort + arange gather); with
        ``distinct_k`` it keeps each group's k smallest DISTINCT content
        hashes (the KMV sketch partial); with ``mode_k`` it keeps each
        group's k smallest distinct content hashes WITH their exact
        per-group counts (the frequency/mode partial); with ``top_k`` it
        keeps each group's k LARGEST durations with their record hashes
        (exact top-k monoid) — extending the cells to
        [cnt, sum (, hs, vs)(, ch)(, mh, mc)(, tv, th)].
        """
        sk = sample_k if hs is not None else 0
        dk = distinct_k if ch is not None else 0
        mk = mode_k if ch is not None else 0
        tk = top_k if hs is not None else 0
        if sk or dk or mk or tk:
            _, kcodes = np.unique(keys_np, return_inverse=True)
            order = np.lexsort(((hs if sk else durs), starts, kcodes))
            kc = kcodes[order]
            ws = starts[order]
            ds = durs[order]
            first = np.r_[True, (kc[1:] != kc[:-1]) | (ws[1:] != ws[:-1])]
            si = np.flatnonzero(first)
            n_g = len(si)
            cnt = np.diff(np.append(si, len(kc)))
            dsum = np.add.reduceat(ds, si)
            ksel = keys_np[order][si]
            if sk:
                h2 = hs[order]
                take = np.minimum(cnt, sk)
                rep = np.repeat(np.arange(n_g), take)
                offs = (np.arange(int(take.sum()))
                        - np.repeat(np.cumsum(take) - take, take))
                sel = si[rep] + offs
                bounds_s = np.zeros(n_g + 1, dtype=np.int64)
                np.cumsum(take, out=bounds_s[1:])
                h_sel, v_sel = h2[sel], ds[sel]
            if dk or mk:
                # second pass ordered by (key, window, content-hash):
                # group enumeration order matches pass 1 (both are sorted
                # by (kcodes, starts) first), so partials align by j
                order2 = np.lexsort((ch, starts, kcodes))
                kc2, ws2, c2 = kcodes[order2], starts[order2], ch[order2]
                gfirst = np.r_[True, (kc2[1:] != kc2[:-1]) | (ws2[1:] != ws2[:-1])]
                newh = gfirst | np.r_[True, c2[1:] != c2[:-1]]
                keep = np.flatnonzero(newh)
                gid = np.cumsum(gfirst) - 1
                gk = gid[keep]
                dcnt = np.bincount(gk, minlength=n_g)
                gstart = np.cumsum(dcnt) - dcnt
                pos = np.arange(len(keep)) - gstart[gk]
            if dk:
                csel = c2[keep[pos < dk]]
                dtake = np.minimum(dcnt, dk)
                bounds_d = np.zeros(n_g + 1, dtype=np.int64)
                np.cumsum(dtake, out=bounds_d[1:])
            if mk:
                # per-distinct-hash run lengths = exact per-group counts
                # (a hash's run never spans groups: newh ⊇ gfirst)
                runlen = np.diff(np.append(keep, len(c2)))
                mmask = pos < mk
                msel_h = c2[keep[mmask]]
                msel_c = runlen[mmask].astype(np.int64)
                mtake = np.minimum(dcnt, mk)
                bounds_m = np.zeros(n_g + 1, dtype=np.int64)
                np.cumsum(mtake, out=bounds_m[1:])
            if tk:
                # third pass ordered by (key, window, -dur, hash): same
                # (kcodes, starts) primary sort as pass 1, so group
                # enumeration aligns by j; per group keep the first tk
                # rows = k largest durations, smallest-hash tie-break
                order3 = np.lexsort((hs, -durs, starts, kcodes))
                kc3, ws3 = kcodes[order3], starts[order3]
                first3 = np.r_[True,
                               (kc3[1:] != kc3[:-1]) | (ws3[1:] != ws3[:-1])]
                si3 = np.flatnonzero(first3)
                cnt3 = np.diff(np.append(si3, len(kc3)))
                take3 = np.minimum(cnt3, tk)
                rep3 = np.repeat(np.arange(n_g), take3)
                offs3 = (np.arange(int(take3.sum()))
                         - np.repeat(np.cumsum(take3) - take3, take3))
                sel3 = si3[rep3] + offs3
                bounds_t = np.zeros(n_g + 1, dtype=np.int64)
                np.cumsum(take3, out=bounds_t[1:])
                t_v = durs[order3][sel3]
                t_h = hs[order3][sel3]
            for j in range(n_g):
                acc = [int(cnt[j]), int(dsum[j])]
                if sk:
                    acc += [h_sel[bounds_s[j]:bounds_s[j + 1]],
                            v_sel[bounds_s[j]:bounds_s[j + 1]]]
                if dk:
                    acc.append(csel[bounds_d[j]:bounds_d[j + 1]])
                if mk:
                    acc += [msel_h[bounds_m[j]:bounds_m[j + 1]],
                            msel_c[bounds_m[j]:bounds_m[j + 1]]]
                if tk:
                    acc += [t_v[bounds_t[j]:bounds_t[j + 1]],
                            t_h[bounds_t[j]:bounds_t[j + 1]]]
                kw = (ksel[j], int(ws[si[j]]))
                for target in targets:
                    _fold_window_cell(target, kw, tuple(acc), sk, dk, mk, tk)
            return
        t = pa.table(
            {
                "k": pa.array(keys_np, pa.string()),
                "w": pa.array(starts, pa.int64()),
                "d": pa.array(durs, pa.int64()),
            }
        )
        gb = t.group_by(["k", "w"], use_threads=False).aggregate(
            [("d", "sum"), ("d", "count")]
        )
        for k, w, d, c in zip(
            gb["k"].to_pylist(), gb["w"].to_pylist(),
            gb["d_sum"].to_pylist(), gb["d_count"].to_pylist(),
        ):
            for target in targets:
                acc = target.get((k, w))
                if acc is None:
                    target[(k, w)] = [c, d]
                else:
                    acc[0] += c
                    acc[1] += d

    def _accumulate_windows(self, sub: pa.Table, ts: np.ndarray,
                            ch: np.ndarray | None = None):
        cfg = self.cfg
        keys_np = np.asarray(
            sub["clip_id"].to_numpy(zero_copy_only=False), dtype=object
        )
        durs = sub["dur_ms"].to_numpy(zero_copy_only=False).astype(np.int64)
        sample_k = getattr(cfg, "window_sample_k", 0)
        distinct_k = getattr(cfg, "window_distinct_k", 0)
        mode_k = getattr(cfg, "window_mode_k", 0)
        top_k = getattr(cfg, "window_top_k", 0)
        if not (distinct_k or mode_k):
            ch = None
        hs = None
        if sample_k or top_k or (getattr(cfg, "session_sample_k", 0)
                                 and cfg.session_gap_ms):
            from ..hashing import hash64

            # per-record hash (seq is globally unique): the deterministic
            # bottom-k sample key — identical whichever partition/salt
            # the row lands on, and dedup-idempotent under replay
            hs = hash64(sub["seq"])
        if cfg.window_size_ms:
            starts = assign_tumbling(ts, cfg.window_size_ms)
            self._merge_window_partials(
                [self.win, self._delta_win], keys_np, starts, durs,
                hs, sample_k, ch, distinct_k, mode_k, top_k,
            )
        if getattr(cfg, "sliding_size_ms", 0):
            from ..stages.windows import explode_sliding

            rows, starts = explode_sliding(ts, cfg.sliding_size_ms, cfg.sliding_slide_ms)
            self._merge_window_partials(
                [self.swin, self._delta_swin], keys_np[rows], starts, durs[rows],
                hs[rows] if hs is not None else None, sample_k,
                ch[rows] if ch is not None else None, distinct_k, mode_k,
                top_k,
            )
        if cfg.session_gap_ms:
            gap = cfg.session_gap_ms
            ssk = getattr(cfg, "session_sample_k", 0)
            # batch-local sessionization (vectorized): sort by (key, ts),
            # break on key change or gap, reduce each run — then merge the
            # few resulting intervals into the open-session state.  The
            # gap-closure partition is order-insensitive, so pre-merging
            # within the batch is exact.
            order = np.lexsort((ts, keys_np))
            ks, ts_s, ds_s = keys_np[order], ts[order], durs[order]
            brk = np.ones(len(ks), dtype=bool)
            brk[1:] = (ks[1:] != ks[:-1]) | ((ts_s[1:] - ts_s[:-1]) > gap)
            si = np.flatnonzero(brk)
            ei = np.append(si[1:], len(ks))
            cnt = ei - si
            sumd = np.add.reduceat(ds_s, si)
            if ssk and hs is not None:
                # per-run bottom-k-by-hash(seq) duration sample (same
                # deterministic monoid as window_sample_k — the gap-merge
                # unions it, so session quantiles survive salting,
                # bridging merges, adoption and rescale).  Runs are
                # contiguous in the (key, ts) order, so one lexsort by
                # (run, hash) leaves each run's rows hash-ascending at
                # positions si[j]:ei[j].
                rid = np.cumsum(brk) - 1
                h2 = hs[order]
                order2 = np.lexsort((h2, rid))
                take = np.minimum(cnt, ssk)
            for j in range(len(si)):
                if ssk and hs is not None:
                    idx = order2[si[j]:si[j] + int(take[j])]
                    self._merge_session_range(
                        ks[si[j]], int(ts_s[si[j]]), int(ts_s[ei[j] - 1]),
                        int(cnt[j]), int(sumd[j]), gap,
                        hs_s=h2[idx].astype(np.uint64),
                        vs_s=ds_s[idx].astype(np.int64),
                    )
                else:
                    self._merge_session_range(
                        ks[si[j]], int(ts_s[si[j]]), int(ts_s[ei[j] - 1]),
                        int(cnt[j]), int(sumd[j]), gap,
                    )

    def _merge_session_range(
        self, key: str, t0: int, t1: int, cnt: int, dur: int, gap: int,
        hs_s: np.ndarray | None = None, vs_s: np.ndarray | None = None,
    ):
        """Insert a session interval [t0, t1] (cnt events, dur sum,
        optional bottom-k duration sample) into the per-key open-session
        list (kept sorted, non-overlapping under the gap relation)."""
        k = getattr(self.cfg, "session_sample_k", 0)
        if getattr(self.cfg, "early_fire", False):
            self._touched_sessions.add(key)
        lst = self.sessions[key]
        new = [t0, t1, cnt, dur]
        if hs_s is not None:
            new += [hs_s, vs_s]
        lo = None
        for s in lst:
            if t0 <= s[1] + gap and t1 >= s[0] - gap:
                lo = s
                break
        if lo is None:
            lst.append(new)
            lst.sort(key=lambda s: s[0])
            return
        lo[0] = min(lo[0], t0)
        lo[1] = max(lo[1], t1)
        lo[2] += cnt
        lo[3] += dur
        if hs_s is not None:
            if len(lo) > 5:
                lo[4], lo[5] = _bottomk_union(lo[4], lo[5], hs_s, vs_s, k)
            else:
                lo.extend([hs_s.copy(), vs_s.copy()])
        # merging may bridge two sessions
        lst.sort(key=lambda s: s[0])
        merged = [lst[0]]
        for s in lst[1:]:
            prev = merged[-1]
            if s[0] <= prev[1] + gap:
                prev[1] = max(prev[1], s[1])
                prev[2] += s[2]
                prev[3] += s[3]
                if len(prev) > 5 and len(s) > 5:
                    prev[4], prev[5] = _bottomk_union(
                        prev[4], prev[5], s[4], s[5], k)
                elif len(s) > 5:
                    prev.extend([s[4], s[5]])
                prev[0] = min(prev[0], s[0])
            else:
                merged.append(s)
        self.sessions[key] = merged

    def ingest_updates(self, table: pa.Table, wm: int) -> dict:
        n = table.num_rows
        if n == 0:
            return {"n": 0, "late": 0, "max_ts": self.max_ts}
        # hot-key fan-out replicas feed join/view state everywhere, but DLQ
        # rows and metrics are accounted ONCE, on the primary (home) copy
        if "__replica" in table.column_names:
            replica = table["__replica"].to_numpy(zero_copy_only=False).astype(bool)
            table = table.drop_columns(["__replica"])
        else:
            replica = np.zeros(n, dtype=bool)
        ts = ts_to_ms(table["event_ts"])
        self.max_ts = max(self.max_ts, int(ts.max()))
        late = ts < wm
        late_primary = late & ~replica
        if late_primary.any():
            self.dlq_buf.append(
                ("updates", "late", table.filter(pa.array(late_primary)))
            )
            self.metrics["updates_late"] += int(late_primary.sum())
        ok = ~late
        if ok.any():
            sel = np.flatnonzero(ok)
            keys = np.asarray(
                table["clip_id"].to_numpy(zero_copy_only=False), dtype=object
            )[sel]
            texts = np.asarray(
                table["transcript"].to_numpy(zero_copy_only=False), dtype=object
            )[sel]
            revs = table["revision"].to_numpy(zero_copy_only=False).astype(np.int64)[sel]
            tss = ts[sel]
            self.upd_chunks.append((keys, tss, revs, texts))
            self._delta_upd.append((keys, tss, revs, texts))
            # compacted view: batch last-write-wins by (ts, rev) — one sort,
            # then a Python merge per DISTINCT key of the batch
            order = np.lexsort((revs, tss, keys))
            ks, t_s, r_s, x_s = keys[order], tss[order], revs[order], texts[order]
            last = np.ones(len(ks), dtype=bool)
            last[:-1] = ks[1:] != ks[:-1]
            chg = getattr(self.cfg, "changelog", False)
            for i in np.flatnonzero(last):
                rec = (int(t_s[i]), int(r_s[i]), x_s[i])
                cur = self.view.get(ks[i])
                if cur is None or (rec[0], rec[1]) >= (cur[0], cur[1]):
                    if chg and ks[i] not in self._chg_prev:
                        self._chg_prev[ks[i]] = cur
                    self.view[ks[i]] = rec
                    self._delta_view[ks[i]] = rec
            self.metrics["updates_in"] += int((ok & ~replica).sum())
            if getattr(self.cfg, "funnel_steps", ()):
                prim = np.flatnonzero(ok & ~replica)
                if len(prim):
                    kk = np.asarray(
                        table["clip_id"].to_numpy(zero_copy_only=False), object
                    )[prim]
                    xx = np.asarray(
                        table["transcript"].to_numpy(zero_copy_only=False), object
                    )[prim]
                    kinds = np.where(
                        pd.isna(xx), np.int8(2), np.int8(1)
                    ).astype(np.int8)  # tombstone → "delete", else "update"
                    self._funnel_append(kk, ts[prim], kinds)
        return {"n": n, "late": int(late.sum()), "max_ts": self.max_ts}

    # -------------------------------------------------------------- close
    def close_epoch(self, epoch: int, wm: int, hot_keys: frozenset = frozenset()) -> dict:
        """Advance to watermark ``wm``: emit, close, evict.  Returns arrow
        outputs {replicated, windows, sessions, dlq} (possibly empty) plus
        hot-key partials (``hot_windows``/``hot_sliding`` tables and the
        ``hot_sessions`` interval list) that the DRIVER merges across salt
        partitions before staging — a salted key's state lives on several
        partitions, so per-partition close emits only its partial.
        """
        out = {}
        out["replicated"] = self._emit_replicated(epoch, wm)
        out["windows"], out["hot_windows"] = self._close_windows(epoch, wm, hot_keys)
        out["sliding"], out["hot_sliding"] = self._close_sliding(epoch, wm, hot_keys)
        out["sessions"], out["hot_sessions"] = self._close_sessions(epoch, wm, hot_keys)
        out["funnels"] = self._close_funnel(epoch, wm)
        if getattr(self.cfg, "changelog", False):
            out["changelog"] = self._emit_changelog(epoch)
        out["dlq"] = self._emit_dlq(epoch)
        if getattr(self.cfg, "early_fire", False):
            # incremental (speculative) window emission: report which
            # still-open tumbling/sliding cells THIS epoch touched (the
            # delta dicts hold exactly this epoch's increments — deltas
            # reset at every checkpoint, and pipelined e+1 ingests are
            # stashed until close(e+1)).  The driver unions the touched
            # sets and asks EVERY partition for its current partial
            # totals (a salted key's cell lives on several partitions,
            # and a partition untouched this epoch may still hold older
            # rows of a touched cell), then merges additively — the same
            # cross-salt fold rule as final close.
            def _touched_tbl(delta, live):
                touched = [kw for kw in delta if kw in live]
                if not touched:
                    return None
                return pa.table({
                    "clip_id": pa.array([k for k, _ in touched],
                                        pa.string()),
                    "window_start": pa.array([w for _, w in touched],
                                             pa.int64()),
                })

            if self.cfg.window_size_ms:
                out["early_touched"] = _touched_tbl(
                    self._delta_win, self.win)
            if getattr(self.cfg, "sliding_size_ms", 0):
                out["early_touched_sliding"] = _touched_tbl(
                    self._delta_swin, self.swin)
            if self.cfg.session_gap_ms:
                out["early_touched_sessions"] = sorted(
                    k for k in self._touched_sessions if k in self.sessions
                ) or None
                self._touched_sessions.clear()
        if wm >= WATERMARK_MAX and self.view:
            # end of stream: materialize the compacted latest-value view
            # (the reference's compacted-topic snapshot, T2 semantics).
            # Fan-out replicas give every salt partition a copy of a hot
            # key's view entry; only the HOME partition emits it.
            out["views"] = _stamp(self.view_snapshot(), self.partition, epoch)
        # Evict join right-side state: a buffered (non-emitted) clip has
        # c.ts + W ≥ wm, and any future non-late clip has c.ts ≥ wm, so no
        # update with u.ts < wm − W can ever match again (matching needs
        # u.ts ≥ c.ts ≥ wm − W).
        horizon = wm - self.cfg.join_window_ms if wm < WATERMARK_MAX else wm
        keys, tss, revs, texts = self._consolidated_updates()
        keep = _update_keep_mask(
            keys, tss, horizon, getattr(self.cfg, "temporal_join", False))
        evicted = int(len(tss) - keep.sum())
        if evicted:
            self.upd_chunks = (
                [(keys[keep], tss[keep], revs[keep], texts[keep])]
                if keep.any()
                else []
            )
        self.metrics["updates_evicted"] += evicted
        self.metrics["epochs_closed"] += 1
        return out

    def render_window_cells(self, cells: pa.Table,
                            kind: str = "windows") -> pa.Table | None:
        """Current PARTIAL totals (base counters only) of the requested
        still-open tumbling ("windows") or sliding ("sliding") cells
        that live on THIS partition — the per-partition half of the
        early-fire emission; the driver adds partials across
        partitions/salts.  Sketch columns stay a close-time/
        queryable-state feature (stable live schema)."""
        if kind == "sliding":
            live, size = self.swin, getattr(self.cfg, "sliding_size_ms", 0)
        else:
            live, size = self.win, self.cfg.window_size_ms
        ks = cells["clip_id"].to_pylist()
        ws = cells["window_start"].to_numpy(zero_copy_only=False)
        rows = []
        for k, w in zip(ks, ws):
            cell = live.get((k, int(w)))
            if cell is not None:
                rows.append((k, int(w), int(cell[0]), int(cell[1])))
        if not rows:
            return None
        return pa.table({
            "clip_id": pa.array([r[0] for r in rows], pa.string()),
            "window_start": pa.array([r[1] for r in rows], pa.int64()),
            "window_end": pa.array([r[1] + size for r in rows], pa.int64()),
            "n_clips": pa.array([r[2] for r in rows], pa.int64()),
            "sum_dur_ms": pa.array([r[3] for r in rows], pa.int64()),
        })

    def render_session_cells(self, keys: list) -> pa.Table | None:
        """Current open-session intervals of the requested keys on THIS
        partition (early-fire sessions tier).  Runs AFTER hot-key
        adoption in the epoch sequence, so every key's open sessions are
        consolidated on exactly one partition — the driver concatenates,
        no cross-partition gap-merge needed."""
        rows = []
        for k in keys:
            for sess in self.sessions.get(k, ()):
                rows.append((k, int(sess[0]), int(sess[1]),
                             int(sess[2]), int(sess[3])))
        if not rows:
            return None
        return pa.table({
            "clip_id": pa.array([r[0] for r in rows], pa.string()),
            "session_start": pa.array([r[1] for r in rows], pa.int64()),
            "session_end": pa.array([r[2] for r in rows], pa.int64()),
            "n_clips": pa.array([r[3] for r in rows], pa.int64()),
            "sum_dur_ms": pa.array([r[4] for r in rows], pa.int64()),
        })

    def _close_funnel(self, epoch: int, wm: int) -> pa.Table | None:
        """Advance every buffered key's earliest-completion chain with the
        rows whose event time passed the watermark; emit one match row per
        key on its completion transition.

        EXACT vs the batch ``funnel_chain`` kernel: chain times only ever
        append (never revise), because every unprocessed row has
        ts ≥ the watermark that processed the rows the existing chain
        summarizes — so per-step ``min`` over (state ∪ new rows) equals
        the batch min over all rows.  Arrival-order and routing
        independent: the per-step scatter is order-free and funnel rows
        always reach the key's HOME partition.
        """
        steps = getattr(self.cfg, "funnel_steps", ())
        if not steps or not self.funnel_buf:
            return None
        keys = np.concatenate([c[0] for c in self.funnel_buf])
        tss = np.concatenate([c[1] for c in self.funnel_buf])
        kinds = np.concatenate([c[2] for c in self.funnel_buf])
        take = tss <= wm if wm < WATERMARK_MAX else np.ones(len(tss), bool)
        if not take.any():
            return None
        rest = ~take
        self.funnel_buf = (
            [(keys[rest], tss[rest], kinds[rest])] if rest.any() else []
        )
        keys, tss, kinds = keys[take], tss[take], kinds[take]

        uniq, codes = np.unique(keys, return_inverse=True)
        S = len(steps)
        t = np.full((len(uniq), S), _I64MAX, np.int64)
        was_complete = np.zeros(len(uniq), bool)
        ul = uniq.tolist()
        for i, k in enumerate(ul):
            ch = self.funnel.get(k)
            if ch:
                t[i, : len(ch)] = ch
                was_complete[i] = len(ch) == S
        prev = np.full(len(uniq), -_I64MAX, np.int64)
        for s, code in enumerate(steps):
            cand = (kinds == code) & (tss > prev[codes])
            np.minimum.at(t[:, s], codes[cand], tss[cand])
            prev = t[:, s]

        levels = (t != _I64MAX).sum(axis=1)
        for i, k in enumerate(ul):
            lv = int(levels[i])
            if lv and len(self.funnel.get(k, ())) != lv:
                ch = t[i, :lv].tolist()
                self.funnel[k] = ch
                self._delta_funnel[k] = ch

        newly = (levels == S) & ~was_complete
        within = getattr(self.cfg, "funnel_within_ms", 0)
        if within:
            newly &= (t[:, -1] - t[:, 0]) <= within
        if not newly.any():
            return None
        self.metrics["funnel_matches"] += int(newly.sum())
        cols = {"clip_id": pa.array(uniq[newly].astype(str))}
        for s in range(S):
            cols[f"t{s + 1}_ms"] = pa.array(t[newly, s], pa.int64())
        return _stamp(pa.table(cols), self.partition, epoch)

    def _emit_changelog(self, epoch: int) -> pa.Table | None:
        """CDC rows for view entries whose LWW winner changed this epoch.

        ``_chg_prev`` holds each changed key's record as of the epoch
        start; the op compares it to the final record: absent/tombstone →
        live = insert, live → live = update, live → tombstone = delete.
        A tombstone landing where nothing lived emits nothing, and a
        duplicate row re-winning with an identical record emits nothing —
        so the changelog replays to exactly the view.  Only the key's
        HOME partition emits (hot-key fan-out replicas upsert view state
        on every salt partition, but each sees the same row set for the
        key, so home emission is complete and exactly-once)."""
        from ..hashing import partition_for

        if not self._chg_prev:
            return None
        keys = np.asarray(sorted(self._chg_prev), dtype=object)
        if self.cfg.num_partitions:
            keys = keys[partition_for(keys, self.cfg.num_partitions)
                        == self.partition]
        rows = []
        for k in keys:
            prev, new = self._chg_prev[k], self.view[k]
            if prev == new:
                continue
            new_tomb = pd.isna(new[2])
            prev_dead = prev is None or pd.isna(prev[2])
            if new_tomb and prev_dead:
                continue
            op = ("delete" if new_tomb
                  else "insert" if prev_dead else "update")
            rows.append((k, op, new[0], new[1],
                         None if new_tomb else new[2]))
        self._chg_prev = {}
        if not rows:
            return None
        self.metrics["changelog_out"] += len(rows)
        tbl = pa.table({
            "clip_id": pa.array([r[0] for r in rows], pa.string()),
            "op": pa.array([r[1] for r in rows], pa.string()),
            "ts_ms": pa.array([r[2] for r in rows], pa.int64()),
            "revision": pa.array([r[3] for r in rows], pa.int32()),
            "transcript": pa.array([r[4] for r in rows], pa.string()),
        })
        return _stamp(tbl, self.partition, epoch)

    def _consolidated_updates(self):
        """Update buffer as (key, ts, rev)-sorted columnar arrays; the
        chunk list is replaced by the consolidated form (amortized)."""
        if not self.upd_chunks:
            z = np.empty(0, dtype=object)
            return z, np.empty(0, np.int64), np.empty(0, np.int64), z.copy()
        keys = np.concatenate([c[0] for c in self.upd_chunks])
        tss = np.concatenate([c[1] for c in self.upd_chunks])
        revs = np.concatenate([c[2] for c in self.upd_chunks])
        texts = np.concatenate([c[3] for c in self.upd_chunks])
        order = np.lexsort((revs, tss, keys))
        keys, tss, revs, texts = keys[order], tss[order], revs[order], texts[order]
        self.upd_chunks = [(keys, tss, revs, texts)]
        return keys, tss, revs, texts

    def _emit_replicated(self, epoch: int, wm: int) -> pa.Table | None:
        """Emit clips whose join horizon passed, enriched with the latest
        matching transcript revision.

        Match bound is HALF-OPEN: update u joins clip c iff
        ``c.ts ≤ u.ts < c.ts + W`` — the watermark-friendly convention,
        identical to the batch ``interval_join`` kernel.  Fully
        vectorized: one (key, ts, rev) sort of the update buffer, then
        two ``searchsorted`` probes per emitted-clip batch; the last
        element of each probe range IS the max-(ts, rev) revision.
        """
        W = self.cfg.join_window_ms
        emitted, kept = [], []
        for t in self.clip_buf:
            ts = ts_to_ms(t["event_ts"])
            # strict: an update with u.ts == wm (not yet late) could still
            # match a clip with c.ts ≤ wm < c.ts + W, so only emit below it
            m = ts + W < wm if wm < WATERMARK_MAX else np.ones(len(ts), bool)
            if m.any():
                emitted.append((t.filter(pa.array(m)), ts[m]))
            if not m.all():
                kept.append(t.filter(pa.array(~m)))
        self.clip_buf = kept
        if not emitted:
            return None
        ukeys, uts, urev, utext = self._consolidated_updates()
        parts = []
        for t, ts in emitted:
            ckeys = np.asarray(
                t["clip_id"].to_numpy(zero_copy_only=False), dtype=object
            )
            orig = np.asarray(
                t["transcript"].to_numpy(zero_copy_only=False), dtype=object
            )
            if len(uts):
                # composite (key-code, ts) probe key: code both key sets
                # together (np.unique, not pd.factorize — pandas' object
                # hashtable compares C-string-style so NUL-containing keys
                # would collide), offset ts into a non-negative span
                _, codes = np.unique(np.concatenate([ukeys, ckeys]), return_inverse=True)
                ucodes = codes[: len(ukeys)].astype(np.int64)
                ccodes = codes[len(ukeys):].astype(np.int64)
                tmin = int(min(uts.min(), ts.min()))
                span = int(max(uts.max(), ts.max() + W)) - tmin + 2
                ucomb = ucodes * span + (uts - tmin)
                # updates are (key, ts, rev)-sorted ⇒ ucomb ascending per key
                order = np.argsort(ucomb, kind="stable")
                ucomb_s = ucomb[order]
                lo = np.searchsorted(ucomb_s, ccodes * span + (ts - tmin), "left")
                hi = np.searchsorted(ucomb_s, ccodes * span + (ts + W - tmin), "left")
                match = hi > lo
                best = order[np.maximum(hi - 1, 0)]
                final_txt = orig.copy()
                final_txt[match] = utext[best[match]]
                deleted = np.zeros(len(ckeys), dtype=bool)
                deleted[match] = pd.isna(utext[best[match]])
                if getattr(self.cfg, "temporal_join", False):
                    # temporal (as-of) probe: latest update with
                    # u.ts ≤ c.ts — the "right" bound of the same probe
                    # key includes equal-ts versions, and the stable
                    # argsort preserved rev order within equal ucomb,
                    # so hi2 − 1 IS the max-(ts, rev) valid version
                    lo2 = np.searchsorted(ucomb_s, ccodes * span, "left")
                    hi2 = np.searchsorted(
                        ucomb_s, ccodes * span + (ts - tmin), "right")
                    m2 = hi2 > lo2
                    best2 = order[np.maximum(hi2 - 1, 0)]
                    asof_txt = np.full(len(ckeys), None, dtype=object)
                    asof_txt[m2] = utext[best2[m2]]
                    asof_txt[pd.isna(asof_txt)] = None  # tombstone → null
                    asof_rev = np.where(m2, urev[best2], 0).astype(np.int64)
                    has_asof = m2
                else:
                    asof_txt = asof_rev = has_asof = None
            else:
                final_txt = orig
                deleted = np.zeros(len(ckeys), dtype=bool)
                if getattr(self.cfg, "temporal_join", False):
                    asof_txt = np.full(len(ckeys), None, dtype=object)
                    asof_rev = np.zeros(len(ckeys), np.int64)
                    has_asof = np.zeros(len(ckeys), bool)
                else:
                    asof_txt = asof_rev = has_asof = None
            t = t.set_column(
                t.schema.get_field_index("transcript"),
                "transcript",
                pa.array(final_txt, pa.string()),
            )
            t = t.append_column("deleted", pa.array(deleted, pa.bool_()))
            if has_asof is not None:
                t = t.append_column(
                    "asof_transcript", pa.array(asof_txt, pa.string()))
                t = t.append_column(
                    "asof_rev", pa.array(asof_rev, mask=~has_asof))
            parts.append(t)
        tbl = pa.concat_tables(parts, promote_options="default")
        tbl = _stamp(tbl, self.partition, epoch)
        self.metrics["replicated_out"] += tbl.num_rows
        return tbl

    def _window_rows_table(self, rows: list, size: int,
                           partial: bool = False) -> pa.Table:
        t = pa.table(
            {
                "clip_id": pa.array([r[0] for r in rows], pa.string()),
                "window_start": pa.array([r[1] for r in rows], pa.int64()),
                "window_end": pa.array([r[1] + size for r in rows], pa.int64()),
                "n_clips": pa.array([r[2] for r in rows], pa.int64()),
                "sum_dur_ms": pa.array([r[3] for r in rows], pa.int64()),
            }
        )
        sample_k = getattr(self.cfg, "window_sample_k", 0)
        distinct_k = getattr(self.cfg, "window_distinct_k", 0)
        idx = 4
        if sample_k and rows and len(rows[0]) > idx + 1:  # [hs, vs] cells
            if partial:
                # hot-key partials carry the RAW sample so the driver
                # merge can re-union before computing quantiles
                t = t.append_column(
                    "sample_h",
                    pa.array([r[idx].tolist() for r in rows],
                             pa.list_(pa.uint64())),
                ).append_column(
                    "sample_v",
                    pa.array([r[idx + 1].tolist() for r in rows],
                             pa.list_(pa.int64())),
                )
            else:
                qs = [_sample_quantiles(r[idx + 1]) for r in rows]
                t = t.append_column(
                    "p50_dur_ms", pa.array([q[0] for q in qs], pa.int64())
                ).append_column(
                    "p90_dur_ms", pa.array([q[1] for q in qs], pa.int64())
                ).append_column(
                    "sample_n",
                    pa.array([len(r[idx + 1]) for r in rows], pa.int64())
                )
            idx += 2
        if distinct_k and rows and len(rows[0]) > idx:    # [ch] KMV cells
            if partial:
                t = t.append_column(
                    "distinct_h",
                    pa.array([r[idx].tolist() for r in rows],
                             pa.list_(pa.uint64())),
                )
            else:
                t = t.append_column(
                    "distinct_content",
                    pa.array([_kmv_estimate(r[idx], distinct_k, n_cap=r[2])
                              for r in rows], pa.int64()),
                )
            idx += 1
        mode_k = getattr(self.cfg, "window_mode_k", 0)
        if mode_k and rows and len(rows[0]) > idx + 1:    # [mh, mc] cells
            if partial:
                t = t.append_column(
                    "mode_hs",
                    pa.array([r[idx].tolist() for r in rows],
                             pa.list_(pa.uint64())),
                ).append_column(
                    "mode_ns",
                    pa.array([r[idx + 1].tolist() for r in rows],
                             pa.list_(pa.int64())),
                )
            else:
                modes = [_mode_of(r[idx], r[idx + 1]) for r in rows]
                t = t.append_column(
                    "mode_h", pa.array([m[0] for m in modes], pa.uint64())
                ).append_column(
                    "mode_n", pa.array([m[1] for m in modes], pa.int64())
                )
            idx += 2
        top_k = getattr(self.cfg, "window_top_k", 0)
        if top_k and rows and len(rows[0]) > idx + 1:     # [tv, th] cells
            if partial:
                # hot-key partials carry hashes too so the driver merge
                # can dedup-union before truncating
                t = t.append_column(
                    "top_vs",
                    pa.array([r[idx].tolist() for r in rows],
                             pa.list_(pa.int64())),
                ).append_column(
                    "top_hs",
                    pa.array([r[idx + 1].tolist() for r in rows],
                             pa.list_(pa.uint64())),
                )
            else:
                t = t.append_column(
                    "top_durs",
                    pa.array([r[idx].tolist() for r in rows],
                             pa.list_(pa.int64())),
                ).append_column(
                    "top1_dur_ms",
                    pa.array([int(r[idx][0]) if len(r[idx]) else 0
                              for r in rows], pa.int64()),
                )
        return t

    def _close_window_dict(
        self, target: dict, size: int, epoch: int, wm: int, hot_keys: frozenset,
        metric: str,
    ) -> tuple[pa.Table | None, pa.Table | None]:
        """Shared tumbling/sliding close: cold rows become this partition's
        staged output; hot rows are PARTIALS returned for driver merge."""
        closed_keys = [kw for kw in target if kw[1] + size <= wm]
        if not closed_keys:
            return None, None
        closed_keys.sort()
        cold, hot = [], []
        for k, w in closed_keys:
            row = (k, w, *target.pop((k, w)))
            (hot if k in hot_keys else cold).append(row)
        tbl = None
        if cold:
            tbl = _stamp(self._window_rows_table(cold, size), self.partition, epoch)
            self.metrics[metric] += tbl.num_rows
        hot_tbl = self._window_rows_table(hot, size, partial=True) if hot else None
        return tbl, hot_tbl

    def _close_windows(self, epoch: int, wm: int, hot_keys: frozenset = frozenset()):
        size = self.cfg.window_size_ms
        if not size or not self.win:
            return None, None
        return self._close_window_dict(
            self.win, size, epoch, wm, hot_keys, "windows_closed"
        )

    def _close_sliding(self, epoch: int, wm: int, hot_keys: frozenset = frozenset()):
        size = getattr(self.cfg, "sliding_size_ms", 0)
        if not size or not self.swin:
            return None, None
        return self._close_window_dict(
            self.swin, size, epoch, wm, hot_keys, "sliding_closed"
        )

    def _close_sessions(self, epoch: int, wm: int, hot_keys: frozenset = frozenset()):
        """Close cold sessions below the watermark; EXTRACT every hot-key
        session (open or closed — a salted key's intervals on different
        partitions may bridge, so closure is decided only after the driver
        merges them and the still-open remainder is adopted by the home
        partition)."""
        gap = self.cfg.session_gap_ms
        if not gap or not self.sessions:
            return None, None
        rows = []
        hot_rows: list[tuple] = []
        for k in sorted(self.sessions.keys()):
            lst = self.sessions[k]
            if k in hot_keys:
                hot_rows.extend((k, *s) for s in lst)
                del self.sessions[k]
                continue
            still_open = []
            for s in lst:
                # strict: a future row with ts == wm joins a session whose
                # last + gap == wm (gap boundary is inclusive in sessionize)
                if s[1] + gap < wm:
                    rows.append((k, *s))
                else:
                    still_open.append(s)
            if still_open:
                self.sessions[k] = still_open
            else:
                del self.sessions[k]
        tbl = None
        if rows:
            tbl = _session_rows_table(
                rows, getattr(self.cfg, "session_sample_k", 0))
            tbl = _stamp(tbl, self.partition, epoch)
            self.metrics["sessions_closed"] += tbl.num_rows
        return tbl, hot_rows or None

    def adopt_sessions(self, merged: dict):
        """Home-partition adoption of driver-merged still-open hot sessions."""
        gap = self.cfg.session_gap_ms
        for k, intervals in merged.items():
            for s in intervals:
                if len(s) > 5:
                    self._merge_session_range(
                        k, s[0], s[1], s[2], s[3], gap,
                        hs_s=s[4], vs_s=s[5])
                else:
                    self._merge_session_range(k, s[0], s[1], s[2], s[3], gap)

    def buffered_updates_for(self, keys: frozenset) -> tuple:
        """Buffered (non-evicted) update records for ``keys`` — shipped to
        salt partitions when a key turns hot so already-buffered revisions
        can still join clips that will now be salted elsewhere."""
        ukeys, uts, urev, utext = self._consolidated_updates()
        if not len(ukeys):
            return None
        m = pd.Series(ukeys).isin(keys).to_numpy()
        if not m.any():
            return None
        return (ukeys[m], uts[m], urev[m], utext[m])

    def _emit_dlq(self, epoch: int) -> pa.Table | None:
        if not self.dlq_buf:
            return None
        parts = []
        for source, reason, t in self.dlq_buf:
            keep = [c for c in ("clip_id", "event_ts", "seq") if c in t.column_names]
            p = t.select(keep)
            err = None
            if "decode_error" in t.column_names:
                err = t["decode_error"]
            p = p.append_column("source", pa.array([source] * len(p), pa.string()))
            p = p.append_column(
                "reason",
                err if err is not None and reason == "decode_error"
                else pa.array([reason] * len(p), pa.string()),
            )
            parts.append(p)
        self.dlq_buf = []
        tbl = pa.concat_tables(parts, promote_options="default")
        tbl = _stamp(tbl, self.partition, epoch)
        self.metrics["dlq_out"] += tbl.num_rows
        return tbl

    # --------------------------------------------------------- view query
    def view_snapshot(self) -> pa.Table:
        from ..hashing import partition_for

        keys = sorted(self.view.keys())
        P = getattr(self.cfg, "num_partitions", 0)
        if keys and P:
            homes = partition_for(np.asarray(keys, dtype=object), P)
            keys = [k for k, h in zip(keys, homes) if h == self.partition]
        return pa.table(
            {
                "clip_id": pa.array(keys, pa.string()),
                "ts_ms": pa.array([self.view[k][0] for k in keys], pa.int64()),
                "revision": pa.array([self.view[k][1] for k in keys], pa.int32()),
                "transcript": pa.array([self.view[k][2] for k in keys], pa.string()),
            }
        )

    # --------------------------------------------------------- checkpoint
    def save(self, directory: str, wm: int | None = None, full: bool = True):
        """Checkpoint: FULL snapshot, or an O(changes-since-last-save)
        DELTA (RocksDB-style; SURVEY §7.1).  Deltas record this epoch's
        raw additions plus the full (small) session/metric state and the
        close watermark; ``restore_chain`` replays full + deltas and
        prunes with the final watermark — exact, because every live-state
        removal (window close, clip emit, update evict) is a monotone
        predicate of the watermark."""
        from ..fs import fensure_dir, fput, fput_table

        fensure_dir(directory)
        if full:
            light = {
                "partition": self.partition,
                "win": self.win,
                "swin": self.swin,
                "sessions": dict(self.sessions),
                "upd_chunks": self.upd_chunks,
                "view": self.view,
                "funnel": self.funnel,
                "funnel_buf": self.funnel_buf,
                "max_ts": self.max_ts,
                "metrics": dict(self.metrics),
                "wm": wm,
            }
            # parquet first, pickle last: a checkpoint is visible (its
            # state.pkl exists) only once every object in it is complete
            if self.clip_buf:
                buf = pa.concat_tables(self.clip_buf, promote_options="default")
                fput_table(buf, os.path.join(directory, "clip_buf.parquet"))
            fput(os.path.join(directory, "state.pkl"),
                 pickle.dumps(light, protocol=pickle.HIGHEST_PROTOCOL))
        else:
            delta = {
                "partition": self.partition,
                "win_delta": self._delta_win,
                "swin_delta": self._delta_swin,
                "upd_delta": self._delta_upd,
                "view_delta": self._delta_view,
                "funnel_delta": self._delta_funnel,
                "funnel_buf_delta": self._delta_funnel_buf,
                "sessions": dict(self.sessions),   # small: open sessions only
                "max_ts": self.max_ts,
                "metrics": dict(self.metrics),
                "wm": wm,
            }
            if self._delta_clips:
                buf = pa.concat_tables(self._delta_clips, promote_options="default")
                fput_table(buf, os.path.join(directory, "clip_delta.parquet"))
            fput(os.path.join(directory, "delta.pkl"),
                 pickle.dumps(delta, protocol=pickle.HIGHEST_PROTOCOL))
        self._reset_deltas()

    def _load_full(self, directory: str):
        from ..fs import fexists, fget, fget_table

        light = pickle.loads(fget(os.path.join(directory, "state.pkl")))
        self.win = light["win"]
        self.swin = light.get("swin", {})
        self.sessions = defaultdict(list, light["sessions"])
        self.upd_chunks = light["upd_chunks"]
        self.view = light["view"]
        self.funnel = light.get("funnel", {})
        self.funnel_buf = light.get("funnel_buf", [])
        self.max_ts = light["max_ts"]
        self.metrics = defaultdict(int, light["metrics"])
        buf_path = os.path.join(directory, "clip_buf.parquet")
        self.clip_buf = []
        if fexists(buf_path):
            self.clip_buf = [fget_table(buf_path)]
        self.dlq_buf = []
        return light.get("wm")

    def _apply_delta(self, directory: str):
        from ..fs import fexists, fget, fget_table

        d = pickle.loads(fget(os.path.join(directory, "delta.pkl")))
        sample_k = getattr(self.cfg, "window_sample_k", 0)
        distinct_k = getattr(self.cfg, "window_distinct_k", 0)
        mode_k = getattr(self.cfg, "window_mode_k", 0)
        top_k = getattr(self.cfg, "window_top_k", 0)
        for target, delta in ((self.win, d["win_delta"]), (self.swin, d["swin_delta"])):
            for kw, acc in delta.items():
                _fold_window_cell(target, kw, acc, sample_k, distinct_k,
                                  mode_k, top_k)
        self.upd_chunks.extend(d["upd_delta"])
        self.view.update(d["view_delta"])
        self.funnel.update(d.get("funnel_delta", {}))
        self.funnel_buf.extend(d.get("funnel_buf_delta", []))
        self.sessions = defaultdict(list, d["sessions"])
        self.max_ts = d["max_ts"]
        self.metrics = defaultdict(int, d["metrics"])
        clip_path = os.path.join(directory, "clip_delta.parquet")
        if fexists(clip_path):
            self.clip_buf.append(fget_table(clip_path))
        return d.get("wm")

    def restore_chain(self, full_dir: str, delta_dirs: list[str]):
        """Restore = full snapshot + deltas, then prune by the final
        watermark (drops everything interim closes emitted/evicted)."""
        wm = self._load_full(full_dir)
        for d in delta_dirs:
            wm = self._apply_delta(d)
        if wm is not None and delta_dirs:
            self._prune_to_watermark(int(wm))
        self._reset_deltas()

    def _prune_to_watermark(self, wm: int):
        cfg = self.cfg
        if cfg.window_size_ms:
            size = cfg.window_size_ms
            self.win = {kw: v for kw, v in self.win.items() if kw[1] + size > wm}
        if getattr(cfg, "sliding_size_ms", 0):
            size = cfg.sliding_size_ms
            self.swin = {kw: v for kw, v in self.swin.items() if kw[1] + size > wm}
        W = cfg.join_window_ms
        kept = []
        for t in self.clip_buf:
            ts = ts_to_ms(t["event_ts"])
            m = ts + W >= wm if wm < WATERMARK_MAX else np.zeros(len(ts), bool)
            if m.any():
                kept.append(t.filter(pa.array(m)))
        self.clip_buf = kept
        horizon = wm - W if wm < WATERMARK_MAX else wm
        keys, tss, revs, texts = self._consolidated_updates()
        keep = _update_keep_mask(
            keys, tss, horizon, getattr(self.cfg, "temporal_join", False))
        self.upd_chunks = (
            [(keys[keep], tss[keep], revs[keep], texts[keep])] if keep.any() else []
        )
        # funnel buffer rows with ts ≤ wm were consumed into the chain
        # state at their close (same monotone predicate)
        if self.funnel_buf:
            fk = np.concatenate([c[0] for c in self.funnel_buf])
            ft = np.concatenate([c[1] for c in self.funnel_buf])
            fd = np.concatenate([c[2] for c in self.funnel_buf])
            keep = ft > wm
            self.funnel_buf = [(fk[keep], ft[keep], fd[keep])] if keep.any() else []
        # sessions are exact (full copy in every delta): closed hot/cold
        # sessions were already removed at their close


def _session_rows_table(rows: list, sample_k: int) -> pa.Table:
    """Closed-session rows → arrow table; with ``session_sample_k`` the
    interval's bottom-k duration sample becomes p50/p90/sample_n columns
    (same nearest-rank rule and column names as the window sample)."""
    tbl = pa.table(
        {
            "clip_id": pa.array([r[0] for r in rows], pa.string()),
            "session_start": pa.array([r[1] for r in rows], pa.int64()),
            "session_end": pa.array([r[2] for r in rows], pa.int64()),
            "n_clips": pa.array([r[3] for r in rows], pa.int64()),
            "sum_dur_ms": pa.array([r[4] for r in rows], pa.int64()),
        }
    )
    if sample_k and rows and len(rows[0]) > 6:
        qs = [_sample_quantiles(r[6]) for r in rows]
        tbl = tbl.append_column(
            "p50_dur_ms", pa.array([q[0] for q in qs], pa.int64())
        ).append_column(
            "p90_dur_ms", pa.array([q[1] for q in qs], pa.int64())
        ).append_column(
            "sample_n", pa.array([len(r[6]) for r in rows], pa.int64())
        )
    return tbl


def _stamp(tbl: pa.Table, partition: int, epoch: int) -> pa.Table:
    n = tbl.num_rows
    tbl = tbl.append_column("partition", pa.array([partition] * n, pa.int32()))
    return tbl.append_column("epoch", pa.array([epoch] * n, pa.int64()))


def _drop_heavy(t: pa.Table) -> pa.Table:
    heavy = [c for c in ("pcm", "bytes") if c in t.column_names]
    return t.drop_columns(heavy) if heavy else t


def _classify(kind: str, table: pa.Table, wm: int) -> dict:
    """Ack stats for a stashed ingest (no state mutation): row count,
    late count and the batch's max event time (the driver folds these
    into per-source watermark frontiers)."""
    n = table.num_rows
    if n == 0:
        return {"n": 0, "late": 0, "max_ts": -(1 << 62)}
    ts = ts_to_ms(table["event_ts"])
    if kind == "clips" and table.schema.get_field_index("decode_error") >= 0:
        bad = pc.is_valid(table["decode_error"]).to_numpy(zero_copy_only=False)
    else:
        bad = np.zeros(n, dtype=bool)
    late = int(((ts < wm) & ~bad).sum())
    return {"n": n, "late": late, "max_ts": int(ts.max())}


# --------------------------------------------------------------------- actor
def find_restore_chain(base: str, epoch: int) -> tuple[str, list[str]] | None:
    """Locate the restore chain for ``epoch`` under one partition's
    checkpoint dir: the newest FULL snapshot ≤ epoch plus every delta
    after it up to epoch.  ``None`` when no restorable chain exists
    (missing full, or a gap in the delta sequence)."""
    from ..fs import fexists, fisdir, flist

    if not fisdir(base):
        return None
    fulls, deltas = [], {}
    for name in flist(base):
        if not name.startswith("e"):
            continue
        e = int(name[1:])
        d = os.path.join(base, name)
        if fexists(os.path.join(d, "state.pkl")):
            fulls.append(e)
        elif fexists(os.path.join(d, "delta.pkl")):
            deltas[e] = d
    fulls = [e for e in fulls if e <= epoch]
    if not fulls:
        return None
    f = max(fulls)
    chain = []
    for e in range(f + 1, epoch + 1):
        if e not in deltas:
            return None  # broken chain
        chain.append(deltas[e])
    return os.path.join(base, f"e{f:06d}"), chain


def _make_actor_cls():
    import ray

    @ray.remote
    class _PartitionStateActor:
        """Ray actor wrapper: state + sink staging + checkpoint I/O.

        ``num_cpus`` is set at creation; one actor per partition, living
        for the whole pipeline run (the streaming analogue of the
        reference's partition-pinned consumers,
        `StreamsManagerActor.scala:153-213`).
        """

        def __init__(self, partition: int, cfg, sink_roots: dict, ckpt_root: str):
            from ..table import Table

            self.state = PartitionState(partition, cfg)
            self.partition = partition
            self.sinks = {name: Table(root) for name, root in sink_roots.items()}
            self.ckpt_root = ckpt_root
            # epoch-tagged stash: ingests are APPLIED at close time, so the
            # driver may overlap epoch e+1's decode/transfer with epoch e's
            # close/checkpoint/commit without interleaving state mutations.
            # Application order within an epoch is irrelevant: every state
            # op is order-independent (sums, buffer appends, max-by-(ts,rev)).
            self.pending: dict[int, list] = {}

        def ingest(
            self, kind: str, table: pa.Table, wm: int, epoch: int = 0, nonce: int = 0
        ) -> dict:
            self.pending.setdefault(epoch, []).append((nonce, kind, table, wm))
            return _classify(kind, table, wm)

        def close_epoch(
            self,
            epoch: int,
            wm: int,
            nonces: dict | None = None,
            hot_keys: list | None = None,
        ) -> dict:
            # ``nonces`` maps epoch → the launch nonce whose ingests are
            # authoritative; stale stashes (a pre-launched slice the driver
            # discarded and re-launched after the source grew) are dropped,
            # never double-applied.
            for e in sorted(k for k in self.pending if k <= epoch):
                for nonce, kind, table, wm_i in self.pending.pop(e):
                    if nonces is not None and nonces.get(e, nonce) != nonce:
                        continue
                    if kind == "clips":
                        self.state.ingest_clips(table, wm_i)
                    elif kind == "funnel":
                        self.state.ingest_funnel(table, wm_i)
                    else:
                        self.state.ingest_updates(table, wm_i)
            hot = frozenset(hot_keys) if hot_keys else frozenset()
            outputs = self.state.close_epoch(epoch, wm, hot)
            staged = {}
            hot_out = {}
            early_touched = outputs.pop("early_touched", None)
            early_touched_sliding = outputs.pop("early_touched_sliding", None)
            early_touched_sessions = outputs.pop(
                "early_touched_sessions", None)
            for name, tbl in outputs.items():
                if name.startswith("hot_"):
                    if tbl is not None:
                        hot_out[name] = tbl
                    continue
                if tbl is not None and name in self.sinks and tbl.num_rows:
                    frag = self.sinks[name].stage_fragment(tbl, epoch, self.partition)
                    staged[name] = frag.to_json()
            # per-epoch heavy-key counts (top few, floor-filtered) feed the
            # driver's sticky hot-set detection; reset for the next epoch
            kc = sorted(
                self.state.key_counts.items(), key=lambda kv: -kv[1]
            )[:128]
            self.state.key_counts = {}
            return {
                "staged": staged,
                "hot": hot_out,
                "key_counts": kc,
                "metrics": dict(self.state.metrics),
                "max_ts": self.state.max_ts,
                "early_touched": early_touched,
                "early_touched_sliding": early_touched_sliding,
                "early_touched_sessions": early_touched_sessions,
            }

        def render_window_cells(self, cells, sliding_cells=None,
                                session_keys=None):
            """Single RPC for all live kinds → (windows, sliding,
            sessions)."""
            w = (self.state.render_window_cells(cells, "windows")
                 if cells is not None else None)
            sl = (self.state.render_window_cells(sliding_cells, "sliding")
                  if sliding_cells is not None else None)
            se = (self.state.render_session_cells(session_keys)
                  if session_keys else None)
            return w, sl, se

        def adopt_sessions(self, merged: dict) -> bool:
            self.state.adopt_sessions(merged)
            return True

        def buffered_updates_for(self, keys: list):
            return self.state.buffered_updates_for(frozenset(keys))

        def checkpoint(self, epoch: int, wm: int | None = None, full: bool = True) -> str:
            d = os.path.join(self.ckpt_root, f"p{self.partition:04d}", f"e{epoch:06d}")
            self.state.save(d, wm=wm, full=full)
            return d

        def restore(self, epoch: int) -> bool:
            """Restore epoch ``epoch``: the newest full snapshot ≤ epoch
            plus every delta after it up to epoch (incremental chain)."""
            base = os.path.join(self.ckpt_root, f"p{self.partition:04d}")
            self.pending.clear()  # un-closed stashed ingests replay from source
            chain = find_restore_chain(base, epoch)
            if chain is None:
                return False
            self.state.restore_chain(*chain)
            return True

        def view_snapshot(self) -> pa.Table:
            return self.state.view_snapshot()

        def ping(self) -> int:
            return self.partition

        def node_id(self) -> str:
            """Which cluster node this actor landed on (multi-node
            placement introspection for the dress-rehearsal test)."""
            import ray

            return ray.get_runtime_context().get_node_id()

    return _PartitionStateActor


_ACTOR_CLS = None


def PartitionStateActor():
    """Lazy accessor for the Ray actor class (keeps module import Ray-free)."""
    global _ACTOR_CLS
    if _ACTOR_CLS is None:
        _ACTOR_CLS = _make_actor_cls()
    return _ACTOR_CLS
