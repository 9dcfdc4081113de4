"""The flagship receive→transform→transport replication pipeline.

Reference lifecycle parity (SURVEY.md §3): micro-batched ingestion of two
keyed streams (clips, transcript updates) → vectorized decode/validation →
hash-partition routing to per-partition state actors (windows, symmetric
join, compacted view) → watermark-driven close → idempotent exactly-once
commit into versioned sink tables, with per-partition lineage, metrics and
checkpoint/resume — the Ray-Data-native rebuild of:

- v2 ingest flow `ingest/.../services/IngestionFlowV2.scala:94-141`
  (validate+convert) → here ``AudioDecoder`` inside ``map_batches``;
- transport ack semantics `core/.../transport/Transport.scala:51-83`
  → here 2PC epoch commit (`hydra_ray.table.lancelite`);
- the consumer-groups replication job's checkpoint/seek/resume design
  `.../util/ConsumerGroupsOffsetConsumer.scala:47-74, 219-248`
  → here per-epoch lineage in sink properties + state checkpoints.

Epoch protocol (all steps deterministic given committed state):
  1. read source deltas (version ranges) as lazy Datasets
  2. map_batches: decode clips / project updates, add partition column,
     route per-partition slices to the owning state actor (acks carry
     max event_ts per partition)
  3. advance watermark  wm = min over sources(max_ts) − allowed_lateness
  4. close_epoch(epoch, wm) on every actor → staged sink fragments
  5. actors checkpoint state for this epoch
  6. commit aux sinks, then the main sink (single source of truth) with
     {lineage, watermark, checkpoints}; replay of any step is idempotent
Crash at ANY point: resume restores the checkpoint of the main sink's
last committed epoch and replays — output rows are exactly those of a
single clean run (FIXTURES.md F4 exactly-once oracle).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .. import fs as _fs
from ..hashing import hash64, partition_for
from ..stages.decode import AudioDecoder
from ..stages.skew import salted_partition_for
from ..state.store import WATERMARK_MAX, PartitionStateActor
from ..table import Table
from ..table.lancelite import FragmentMeta

__all__ = ["ReplicateConfig", "ReplicatePipeline", "CrashPoint"]


class CrashPoint(RuntimeError):
    """Injected failure for exactly-once tests."""


@dataclass
class ReplicateConfig:
    num_partitions: int = 8
    join_window_ms: int = 60_000
    allowed_lateness_ms: int = 30_000
    window_size_ms: int = 10_000
    session_gap_ms: int = 0                  # 0 = session windows off
    sliding_size_ms: int = 0                 # 0 = sliding windows off
    sliding_slide_ms: int = 0
    max_versions_per_epoch: int = 1
    batch_size: int = 512
    actor_num_cpus: float = 0.5
    keep_checkpoints: int = 2
    record_size_limit: int = 0
    # hot-key salting (north-rule skew handling): keys whose cumulative
    # share of clip rows reaches the threshold are STICKY-hot — their
    # clips spread over n_salts salted partitions, their updates fan out
    # to the salt set, and window/session state merges at close
    # (stages/skew.py strategy, wired end to end).  0 disables.
    # incremental (speculative) window emission: each epoch upserts the
    # CURRENT cross-partition totals of every tumbling cell touched that
    # epoch into the windows_live sink (provisional rows; the windows
    # sink's close-time rows stay the exact finals — read via
    # read_windows_live).  Off by default: the live view costs one extra
    # actor round-trip + one staged fragment per epoch.
    early_fire: bool = False
    hot_key_threshold: float = 0.01
    n_salts: int = 4
    # full state snapshot every K epochs; the epochs between checkpoint
    # O(delta) only (restore = full + delta chain, store.py)
    full_checkpoint_every: int = 4
    # cross-epoch exact content dedup (state/dedup_index.py): a clip
    # whose content hash was already ingested in ANY earlier epoch (or a
    # non-min-seq copy within this epoch) is dropped before decode.
    dedup: bool = False
    num_dedup_shards: int = 4                # semantic, like num_partitions
    dedup_cols: tuple = ("bytes",)
    # 0 = dedup against the WHOLE corpus history (state grows with
    # distinct content; scale by sharding wider).  >0 bounds the seen-set
    # for endless streams: entries first seen below watermark − retention
    # evict, and identical content re-admits afterwards — eviction rides
    # the committed watermark sequence, so replay is identical.
    dedup_retention_ms: int = 0
    # cross-epoch NEAR-dup (state/neardup_index.py): a clip whose 64-bit
    # perceptual fingerprint is within neardup_max_hamming of ANY
    # retained clip (any earlier epoch, or a smaller-seq keeper of this
    # epoch) is dropped before routing.  Composes with cfg.dedup: the
    # drop sets union (byte-identical copies resolve identically in both
    # tiers, so the union is consistent).
    neardup: bool = False
    num_neardup_shards: int = 4              # semantic, like num_partitions
    neardup_bands: int = 4                   # 16-bit bands of the 64-bit fp
    neardup_max_hamming: int = 3             # must stay < neardup_bands
    # which 64-bit signature feeds the index: "audio_fp" (decode +
    # perceptual fingerprint), "simhash" (transcript SimHash, no decode)
    # or "minhash" (banded transcript minhash — fuzzier token-level
    # matching; the index probes under the LANE metric and
    # neardup_max_hamming is ignored in favor of min_band_matches)
    neardup_signature: str = "audio_fp"
    # minhash mode: a row near-dups a keeper iff ≥ this many of the
    # neardup_bands 16-bit minhash lanes agree (P(lane) = J^rows_per_band)
    neardup_min_band_matches: int = 2
    # like dedup_retention_ms, for the near-dup index (0 = keep forever)
    neardup_retention_ms: int = 0
    # streaming per-window quantiles: keep a deterministic bottom-k-by-
    # hash(seq) sample of dur_ms per (clip_id, window) in the window
    # state and emit p50_dur_ms/p90_dur_ms/sample_n at close.  The
    # sample is a mergeable monoid (union → k smallest hashes, dedup by
    # hash), so it is salting/routing-independent, delta-checkpointable
    # and N→M-rescale-safe like the count/sum partials; k ≥ the window's
    # row count makes the quantiles EXACT.  0 disables (schema unchanged).
    window_sample_k: int = 0
    # streaming per-window APPROXIMATE DISTINCT-CONTENT count: each
    # (clip_id, window) cell keeps a KMV sketch (the k smallest DISTINCT
    # hash64 values over ``dedup_cols`` content, hashed in the routing
    # task) and close emits ``distinct_content`` — exact while a cell
    # has < k distinct payloads, (k−1)/v_k beyond.  The sketch is a
    # dedup-idempotent union monoid like window_sample_k, so it is
    # salting/routing-independent, delta-checkpoint- and rescale-safe.
    # Composes with the dedup tier (tier-dropped duplicates never reach
    # the window, so counts are over SURVIVING rows).  0 disables.
    window_distinct_k: int = 0
    # streaming per-window MODE (most-frequent content): each
    # (clip_id, window) cell keeps the k smallest DISTINCT content
    # hashes WITH their exact counts (bottom-k-with-counts — counts are
    # additive partials, hash membership is the KMV rule, so the sample
    # is an order-independent monoid: salting/routing-independent,
    # delta-checkpoint- and rescale-safe) and close emits ``mode_h``
    # (content hash of the most frequent variant, count ties → smallest
    # hash) + ``mode_n`` (its EXACT count).  Exact mode whenever the
    # cell's distinct content ≤ k — the same regime where
    # window_distinct_k is exact; beyond that it is the mode of a
    # deterministic uniform sample of the distinct contents.  Flags a
    # near-duplicate storm (one variant dominating a window) without
    # buffering rows.  0 disables (schema unchanged).
    window_mode_k: int = 0
    # streaming per-window EXACT TOP-K RECORDS by duration: each
    # (clip_id, window) cell keeps the k LARGEST dur_ms with their
    # record hashes (hash64(seq); union dedups by hash, keeps the k
    # largest — an exact order-independent monoid: a record in the
    # union's top-k has < k larger records in every partial's subset
    # view, so each partial kept it) and close emits ``top_durs``
    # (values, descending) + ``top1_dur_ms``.  Salting/routing-
    # independent, delta-checkpoint- and rescale-safe.  0 disables
    # (schema unchanged).
    window_top_k: int = 0
    # streaming per-SESSION duration quantiles: each open session
    # interval additionally carries a deterministic bottom-k-by-
    # hash(seq) sample of dur_ms (the window_sample_k monoid), unioned
    # through every gap-merge — batch pre-merge, bridging merges, the
    # driver's cross-salt merge, home adoption and N→M rescale — and
    # closed sessions emit p50_dur_ms/p90_dur_ms/sample_n.  k ≥ the
    # session's row count makes the quantiles EXACT.  0 disables
    # (schema unchanged).
    session_sample_k: int = 0
    # streaming TEMPORAL (as-of) join: every emitted clip row
    # additionally carries the transcript version that was VALID AT the
    # clip's own event time — the latest update with
    # u.ts ≤ c.ts (ties by revision), i.e. Flink's temporal-table join
    # against the versioned view, vs the forward-looking
    # [c.ts, c.ts + W) enrich that `transcript` reports.  Emits
    # ``asof_transcript`` (null when no version existed yet, or the
    # valid version was a tombstone) and ``asof_rev`` (null only when no
    # version existed).  Finality needs no extra buffering: a clip emits
    # once c.ts + W < wm, and any update admitted later has
    # u.ts ≥ wm > c.ts.  Eviction keeps the LATEST update per key below
    # the horizon (it stays the as-of version for every future clip
    # until a newer one passes the horizon) — still a monotone
    # watermark predicate, so delta-checkpoint replay stays exact.
    temporal_join: bool = False
    # CEP funnel over the combined stream (clip lifecycle patterns): an
    # ordered tuple of event kinds from {"clip", "update", "delete"}
    # ("clip" = clip arrival, "update" = non-tombstone transcript update,
    # "delete" = tombstone).  A key emits ONE row into the `funnels` sink
    # at the epoch where its earliest-completion chain completes (within
    # funnel_within_ms of the first step when set).  () disables.
    funnel_steps: tuple = ()
    funnel_within_ms: int = 0
    # CDC changelog of the compacted transcript view (the reference's
    # compacted-topic semantics made observable): every epoch, each key
    # whose last-write-wins view entry changed emits ONE row into the
    # `changelog` sink — op ∈ {insert, update, delete} (delete = the
    # winning record is a tombstone), stamped with the winning (ts, rev).
    # Emitted by the key's HOME partition only (salting fan-out safe) and
    # exactly-once through the same staged-fragment 2PC as every sink.
    changelog: bool = False
    # per-clip audio features (rms/peak/zcr/clip_ratio/dom_freq_hz)
    # computed inside the decode task and carried on the payload fragment
    # — read_replicated surfaces them on every emitted row with zero
    # extra object-store traffic (the feature pass reuses the PCM that
    # is already hot in the ingest worker)
    audio_features: bool = False
    # pooled log-mel filterbank features (fbank_mean/fbank_std 16-band
    # fixed-size lists + n_frames) on the payload fragments — the
    # streaming form of `stages/audio_features.audio_fbank`; composes
    # with audio_features and follows the same transform rule (computed
    # on the TRANSFORMED payload when payload_transform is set)
    audio_fbank: bool = False
    # payload transform hook (§2.11 extension surface): a DETERMINISTIC
    # callable applied to each staged heavy slice (columns seq, pcm,
    # n_samples, sr_hz) before it is written — curation at ingest
    # (e.g. `trim_payload` = silence trimming).  Must be a pure function
    # of the rows (replay idempotence) and preserve seq/pcm/n_samples.
    payload_transform: object | None = None
    # payload FILTER hook (curation-at-ingest gating): a DETERMINISTIC
    # callable over the decoded clip batch returning a boolean keep mask
    # (True = keep).  Runs in the parallel routing tasks (PCM hot in
    # cache) on decode-ok rows only; dropped clips route to the DLQ with
    # reason "filtered" and count in ``clips_filtered`` — they never
    # enter windows/sessions/join state and their payload is never
    # staged.  Must be a pure function of the rows (replay idempotence).
    # e.g. ``audio_loudness.loudness_gate(min_lufs=-45)``.
    payload_filter: object | None = None
    # Ingest execution: "tasks" = one raw Ray task per input fragment
    # (measured ~50 ms/epoch overhead — right for sub-second micro-batch
    # epochs); "dataset" = the ray.data path (streaming executor,
    # backpressure — right for large bulk epochs).  Same route kernel
    # either way; outputs are identical.
    ingest_mode: str = "tasks"
    # overlap epoch e+1's ingest tasks with epoch e's close/commit
    pipeline_epochs: bool = True
    # maintenance: bin-pack each sink's small fragments every K committed
    # epochs (0 = off); content/time-travel preserving (Table.compact)
    compact_sinks_every: int = 0
    # maintenance: bound each sink's manifest log on an endless stream —
    # keep only the newest K manifest versions (0 = keep all; shortens
    # time travel to the kept window, Table.truncate_history).  Runs on
    # the compact_sinks_every cadence when compaction is on, else every
    # 8 epochs.
    keep_history_versions: int = 0
    # test hooks: raise CrashPoint at a given (epoch, point)
    crash_at: tuple | None = None            # e.g. (1, "after_prepare")


HEAVY_COLS = ("pcm", "n_samples", "bytes")


def _route_factory(
    handles,
    kind: str,
    wm: int,
    key_col: str,
    P: int,
    decoder=None,
    payload_root: str | None = None,
    epoch: int = 0,
    nonce: int = 0,
    hot_keys: frozenset = frozenset(),
    n_salts: int = 4,
    flush_bytes: int = 64 << 20,
    drop: np.ndarray | None = None,
    funnel_on: bool = False,
    features: bool = False,
    fbank: bool = False,
    payload_transform=None,
    payload_filter=None,
    distinct_k: int = 0,
    content_cols: tuple = ("bytes",),
):
    """Build the map_batches ingest fn: (decode →) partition slices →
    heavy payload STAGED STRAIGHT TO THE SINK, light rows → state actors.

    The heavy decoded PCM takes the shortest possible path — read block →
    decode in-task → staged parquet fragment per (epoch, partition) —
    and never transits the object store again, never sits in actor state,
    never re-writes at checkpoint.  Only the light columns (ids,
    timestamps, transcript, error) go to the per-partition state actors,
    which manage windows/join/late semantics and later emit light
    "finalize" rows; the logical replicated output is payload ⨝ finalize
    on ``seq`` (see ``read_replicated``).  This is the 100 TB-correct
    layout: state stores hold megabytes while the data plane streams
    terabytes.

    Payload fragments contain exactly the rows that will eventually be
    emitted (decode-ok and not late vs ``wm`` — the same deterministic
    predicate the actor applies), so the 2PC commit of an epoch covers
    payloads and state outputs together and replay stays idempotent.

    The ``ray.get`` on the acks back-pressures the task until the actor
    has absorbed the slice — the bounded alternative to the reference's
    unbounded producer queue (`KafkaClientAlgebra.scala:244`).

    Payload staging is BYTE-BOUNDED, not per-batch: the returned router
    accumulates each partition's heavy slices and flushes a fragment when
    ``flush_bytes`` accumulate (or at task end via ``flush()``) — small
    batches then produce few well-sized files instead of a tiny parquet
    file per (batch, partition), which matters both here (writer setup
    per file) and on object storage at scale (small-file explosion).
    """
    return _Router(
        handles, kind, wm, key_col, P, decoder, payload_root, epoch, nonce,
        hot_keys, n_salts, flush_bytes, drop, funnel_on, features,
        payload_transform, fbank, distinct_k, content_cols,
        payload_filter,
    )


class _Router:
    def __init__(
        self, handles, kind, wm, key_col, P, decoder, payload_root,
        epoch, nonce, hot_keys, n_salts, flush_bytes, drop=None,
        funnel_on=False, features=False, payload_transform=None,
        fbank=False, distinct_k=0, content_cols=("bytes",),
        payload_filter=None,
    ):
        self.distinct_k = distinct_k
        self.content_cols = content_cols
        self.funnel_on = funnel_on
        self.features = features
        self.fbank = fbank
        self.payload_transform = payload_transform
        self.payload_filter = payload_filter
        self.handles = handles
        self.kind = kind
        self.wm = wm
        self.key_col = key_col
        self.P = P
        self.decoder = decoder
        self.payload_root = payload_root
        self.epoch = epoch
        self.nonce = nonce
        self.hot_keys = hot_keys
        self.n_salts = n_salts
        self.flush_bytes = flush_bytes
        self.drop = drop                     # sorted seqs to drop (dedup)
        self._pending: dict[int, list[pa.Table]] = {}
        self._pbytes = 0
        # frag json strings from mid-stream byte-threshold flushes; the
        # owner (ingest task / dataset wrapper) drains these at the end
        self.frag_jsons: list[str] = []

    def flush(self) -> dict[int, str]:
        """Stage all accumulated payload slices → {partition: frag json}."""
        if not self._pending:
            return {}
        from ..table import Table as _Table

        payload_tbl = _Table(self.payload_root)
        frags = {}
        for p in sorted(self._pending):
            tables = self._pending[p]
            heavy = (
                tables[0]
                if len(tables) == 1
                else pa.concat_tables(tables, promote_options="default")
            )
            # passthrough fragments hold already-encoded audio bytes —
            # snappy would scan them for nothing; PCM fragments keep it
            comp = (None if "bytes" in heavy.column_names else "snappy")
            frag = payload_tbl.stage_fragment(
                heavy, self.epoch, p, compression=comp
            )
            frags[p] = json.dumps(frag.to_json())
        self._pending = {}
        self._pbytes = 0
        return frags

    def __call__(self, batch: pa.Table) -> pa.Table:
        import time as _time

        import ray

        handles, kind, wm, key_col, P = (
            self.handles, self.kind, self.wm, self.key_col, self.P,
        )
        decoder, payload_root = self.decoder, self.payload_root
        epoch, nonce = self.epoch, self.nonce
        hot_keys, n_salts = self.hot_keys, self.n_salts
        from ..stages.windows import ts_to_ms as _ts_to_ms

        if batch.num_rows == 0:
            return _empty_ack()
        if self.drop is not None and len(self.drop):
            # duplicate content (resolved by the dedup tier BEFORE this
            # pass) drops here — ahead of the decode it would have cost
            from ..state.dedup_index import in_sorted

            dup = in_sorted(self.drop, batch["seq"].to_numpy())
            if dup.any():
                batch = batch.filter(pa.array(~dup))
                if batch.num_rows == 0:
                    return _empty_ack()
        ch = None
        if self.distinct_k and kind == "clips":
            # content hash for the window KMV distinct sketch — computed
            # HERE (parallel route tasks, raw bytes still present), never
            # in the serial state actors; rides as one light uint64 col
            from ..state.dedup_index import content_hash_of

            ch = content_hash_of(batch, self.content_cols)
        t0 = _time.perf_counter()
        if decoder is not None:
            batch = decoder(batch)
        t1 = _time.perf_counter()
        filt = None
        if self.payload_filter is not None and kind == "clips":
            # content gate on decode-ok rows only (bad rows DLQ as
            # decode errors regardless; their pcm may be empty).  The
            # mask rides as one light bool column; the state actor DLQs
            # marked rows with reason "filtered" and never buffers them.
            okd = pc.is_null(batch["decode_error"]).to_numpy(
                zero_copy_only=False)
            m = np.ones(batch.num_rows, bool)
            oki = np.flatnonzero(okd)
            if len(oki):
                sub = batch.take(pa.array(oki))
                m[oki] = np.asarray(self.payload_filter(sub), dtype=bool)
            filt = okd & ~m
            batch = batch.append_column("__filtered", pa.array(filt))
        keys = batch[key_col]
        if kind == "clips" and hot_keys:
            # hot clips spread over n_salts salted partitions (salt from
            # the deterministic per-row seq, so replay routes identically)
            parts = salted_partition_for(
                keys, hot_keys, P, n_salts,
                batch["seq"].to_numpy(zero_copy_only=False),
            )
        else:
            parts = partition_for(keys, P)
        funnel_refs = []
        if kind == "clips" and self.funnel_on and hot_keys:
            # funnel state lives on the HOME partition only (per-key
            # sequential chain — never salted); fan the light funnel rows
            # of salted-away clips home, pre-filtered to the same
            # will-emit predicate the actor applies
            home = partition_for(keys, P)
            fok = pc.is_null(batch["decode_error"]).to_numpy(zero_copy_only=False)
            fok &= _ts_to_ms(batch["event_ts"]) >= wm
            if filt is not None:
                fok &= ~filt
            diff = np.flatnonzero(fok & (home != parts))
            if len(diff):
                mini = batch.select(["clip_id", "event_ts"]).take(pa.array(diff))
                hp = home[diff]
                for p in np.unique(hp):
                    sub = mini.take(pa.array(np.flatnonzero(hp == p)))
                    funnel_refs.append(
                        handles[int(p)].ingest.remote("funnel", sub, wm, epoch, nonce)
                    )
        replica_rows: dict = {}  # partition -> replica row indices
        if kind == "updates" and hot_keys:
            # fan hot-key updates out to every salt partition of the key
            # (the home copy stays primary; replicas feed join/view state
            # but are excluded from DLQ/metrics accounting)
            keys_np = np.asarray(keys.to_numpy(zero_copy_only=False), dtype=object)
            import pandas as _pd

            hm = _pd.Series(keys_np).isin(hot_keys).to_numpy()
            if hm.any():
                hrows = np.flatnonzero(hm)
                hkeys = keys_np[hrows].astype(str)
                rep_rows, rep_parts = [], []
                for s in range(n_salts):
                    salted = np.char.add(hkeys, f"#{s}").astype(object)
                    ps = (hash64(salted) % np.uint64(P)).astype(np.int64)
                    rep_rows.append(hrows)
                    rep_parts.append(ps)
                rr = np.concatenate(rep_rows)
                rp = np.concatenate(rep_parts)
                keep = rp != parts[rr]         # home copy is the primary
                combo = np.unique(rr[keep].astype(np.int64) * P + rp[keep])
                rr, rp = combo // P, combo % P
                replica_rows = {int(p): rr[rp == p] for p in np.unique(rp)}
        light = batch.drop_columns([c for c in HEAVY_COLS if c in batch.column_names])
        if ch is not None:
            light = light.append_column("content_h", pa.array(ch, pa.uint64()))
        feat_cols: dict[str, np.ndarray] = {}
        fb_mean = fb_std = fb_nf = None
        if payload_root is not None:
            # same deterministic will-emit predicate the state actor applies
            ok = pc.is_null(batch["decode_error"]).to_numpy(zero_copy_only=False)
            ok &= _ts_to_ms(batch["event_ts"]) >= wm
            if filt is not None:
                ok &= ~filt
            if self.features and ok.any() and self.payload_transform is None:
                # per-clip audio features computed IN the decode task (the
                # PCM is already hot in this worker's cache) and carried on
                # the payload fragment — read_replicated surfaces them on
                # every emitted row, and the feature pass adds zero extra
                # object-store traffic.  With a payload_transform the
                # features must instead describe the TRANSFORMED payload
                # (the audio actually stored), so they are computed
                # post-transform in the partition loop below (ADVICE r2).
                from ..stages.audio_features import audio_features

                oki = np.flatnonzero(ok)
                f = audio_features(
                    batch.select(["pcm", "sr_hz"]).take(pa.array(oki))
                )
                for name in ("rms", "peak", "zero_cross_rate",
                             "clip_ratio", "dom_freq_hz"):
                    full = np.full(batch.num_rows, np.nan)
                    full[oki] = f[name].to_numpy(zero_copy_only=False)
                    feat_cols[name] = full
            if self.fbank and ok.any() and self.payload_transform is None:
                from ..stages.audio_features import audio_fbank

                oki = np.flatnonzero(ok)
                fbt = audio_fbank(
                    batch.select(["pcm", "sr_hz"]).take(pa.array(oki))
                )
                n_mels = 16
                fb_mean = np.zeros((batch.num_rows, n_mels), np.float32)
                fb_std = np.zeros((batch.num_rows, n_mels), np.float32)
                fb_nf = np.zeros(batch.num_rows, np.int64)
                fb_mean[oki] = np.asarray(
                    fbt["fbank_mean"].combine_chunks().flatten()
                ).reshape(-1, n_mels)
                fb_std[oki] = np.asarray(
                    fbt["fbank_std"].combine_chunks().flatten()
                ).reshape(-1, n_mels)
                fb_nf[oki] = fbt["n_frames"].to_numpy(zero_copy_only=False)
        refs, sent = [], []
        all_parts = np.union1d(
            np.unique(parts), np.array(sorted(replica_rows), dtype=parts.dtype)
        )
        for p in all_parts:
            prim = np.flatnonzero(parts == p)
            reps = replica_rows.get(int(p))
            if reps is not None and len(reps):
                sub = light.take(pa.array(np.concatenate([prim, reps])))
                flags = np.zeros(len(prim) + len(reps), dtype=bool)
                flags[len(prim):] = True
                sub = sub.append_column("__replica", pa.array(flags))
            else:
                sub = light.take(pa.array(prim))
            # epoch tag is REQUIRED: actors stash and apply at close(epoch),
            # so pipelined e+1 ingests can never leak into close(e) state
            # or its checkpoint (which would double-ingest after a crash);
            # the nonce lets close drop stashes from discarded pre-launches
            refs.append(handles[p].ingest.remote(kind, sub, wm, epoch, nonce))
            sent.append(int(p))
            if payload_root is not None:
                keep = np.flatnonzero(ok & (parts == p))
                if len(keep):
                    xform = self.payload_transform
                    if xform is None and "bytes" in batch.column_names:
                        # PASSTHROUGH staging (bytes-per-clip lever): the
                        # source's ENCODED payload (1–4 B/sample) stages
                        # instead of the decoded float32 PCM (4 B/sample)
                        # — decode still ran (validation, features), but
                        # its full-width output never leaves this task;
                        # read_replicated re-decodes bit-identically
                        # through the same LUT kernels on demand.
                        cols = ["seq", "bytes", "codec", "sr_hz",
                                "n_samples"]
                    else:
                        cols = ["seq", "pcm", "n_samples"] + (
                            ["sr_hz"] if xform is not None else []
                        )
                    heavy = batch.select(cols).take(pa.array(keep))
                    if xform is not None:
                        heavy = xform(heavy)
                        if self.features:
                            # features over the TRANSFORMED PCM — they must
                            # describe the stored payload, not the
                            # as-decoded clip (e.g. trim_payload removes
                            # the silence rms/dom_freq would otherwise
                            # include)
                            from ..stages.audio_features import (
                                audio_features,
                            )

                            f = audio_features(
                                heavy.select(["pcm", "sr_hz"])
                            )
                            for name in ("rms", "peak", "zero_cross_rate",
                                         "clip_ratio", "dom_freq_hz"):
                                heavy = heavy.append_column(
                                    name,
                                    pa.array(
                                        f[name].to_numpy(
                                            zero_copy_only=False
                                        ),
                                        pa.float64(),
                                    ),
                                )
                        if self.fbank:
                            from ..stages.audio_features import audio_fbank

                            fbt = audio_fbank(
                                heavy.select(["pcm", "sr_hz"])
                            )
                            for name in ("fbank_mean", "fbank_std",
                                         "n_frames"):
                                heavy = heavy.append_column(
                                    name, fbt[name]
                                )
                    for name, full in feat_cols.items():
                        heavy = heavy.append_column(
                            name, pa.array(full[keep], pa.float64())
                        )
                    if fb_mean is not None:
                        heavy = heavy.append_column(
                            "fbank_mean",
                            pa.FixedSizeListArray.from_arrays(
                                pa.array(fb_mean[keep].reshape(-1),
                                         pa.float32()), 16))
                        heavy = heavy.append_column(
                            "fbank_std",
                            pa.FixedSizeListArray.from_arrays(
                                pa.array(fb_std[keep].reshape(-1),
                                         pa.float32()), 16))
                        heavy = heavy.append_column(
                            "n_frames", pa.array(fb_nf[keep], pa.int64()))
                    if "pcm" in heavy.column_names:
                        heavy = _quantize_pcm_lossless(heavy)
                    self._pending.setdefault(int(p), []).append(heavy)
                    self._pbytes += heavy.nbytes
        if self._pbytes >= self.flush_bytes:
            self.frag_jsons.extend(self.flush().values())
        t2 = _time.perf_counter()
        acks = ray.get(refs)
        if funnel_refs:
            ray.get(funnel_refs)
        t3 = _time.perf_counter()
        k = len(sent)
        return pa.table(
            {
                "source": pa.array([kind] * k, pa.string()),
                "partition": pa.array(sent, pa.int32()),
                "n": pa.array([a["n"] for a in acks], pa.int64()),
                "late": pa.array([a["late"] for a in acks], pa.int64()),
                "max_ts": pa.array([a["max_ts"] for a in acks], pa.int64()),
                "payload_frag": pa.array([""] * k, pa.string()),
                "decode_s": pa.array([t1 - t0] * k, pa.float64()),
                "send_s": pa.array([t2 - t1] * k, pa.float64()),
                "ack_wait_s": pa.array([t3 - t2] * k, pa.float64()),
            }
        )


_INGEST_TASK = None


def _ingest_task_fn():
    """Raw-task ingest unit (lazy ``ray.remote`` wrapper).

    One task per input fragment file: read → sub-batch loop over the same
    route kernel as the Dataset path → plain-dict acks.  ``max_retries=0``:
    the epoch-level retry (driver resume) owns failure handling, so a task
    can never double-ingest into actor state.
    """
    global _INGEST_TASK
    if _INGEST_TASK is None:
        import ray

        @ray.remote(max_retries=0)
        def ingest_fragment(paths, route, batch_size, columns):
            import pyarrow.parquet as pq

            out = []
            for path in paths:
                t = pq.read_table(path, columns=columns)
                for lo in range(0, t.num_rows, batch_size):
                    ack = route(t.slice(lo, min(batch_size, t.num_rows - lo)))
                    out.extend(ack.to_pylist())
            # final payload flush: one fragment per partition per TASK
            # (plus any byte-threshold mid-flushes), not per batch
            frags = list(route.frag_jsons) + list(route.flush().values())
            return {"acks": out, "frags": frags}

        _INGEST_TASK = ingest_fragment
    return _INGEST_TASK


def _per_batch_route(router: "_Router"):
    """Dataset-mode wrapper: a fresh accumulator per batch (map_batches
    functions run stateless per batch), flushed immediately; the frag
    strings ride in the ack table's payload_frag column (record-separator
    joined — partition identity lives inside each frag json)."""
    import copy

    def fn(batch: pa.Table) -> pa.Table:
        r = copy.copy(router)
        r._pending = {}
        r._pbytes = 0
        r.frag_jsons = []
        ack = r(batch)
        frags = r.frag_jsons + list(r.flush().values())
        if frags:
            k = ack.num_rows
            col = pa.array(["\x1e".join(frags)] + [""] * (k - 1), pa.string())
            ack = ack.set_column(
                ack.schema.get_field_index("payload_frag"), "payload_frag", col
            )
        return ack

    return fn


def _empty_ack() -> pa.Table:
    return pa.table(
        {
            "source": pa.array([], pa.string()),
            "partition": pa.array([], pa.int32()),
            "n": pa.array([], pa.int64()),
            "late": pa.array([], pa.int64()),
            "max_ts": pa.array([], pa.int64()),
            "payload_frag": pa.array([], pa.string()),
            "decode_s": pa.array([], pa.float64()),
            "send_s": pa.array([], pa.float64()),
            "ack_wait_s": pa.array([], pa.float64()),
        }
    )


def _quantize_pcm_lossless(heavy: pa.Table) -> pa.Table:
    """Transform-path bytes lever: rows whose float32 pcm still sits on
    the int16 grid (value·32768 integral, |·| ≤ 32767 — true for every
    slice-style transform like trim over int16-origin sources; false
    after gain scaling or for f32-codec sources) store as
    ``pcm_q: large_list<int16>`` (2 B/sample) with ``pcm`` nulled; the
    rest keep float32 ``pcm``.  Both columns exist in every fragment
    (stable schema for concat/compaction); reconstruction multiplies by
    the decode constant float32(1/32767) — verified exact per element
    at quantize time, so the round trip is bit-identical.  One multiply
    + compare pass per batch decides; per-row, never per-fragment."""
    pcm = heavy["pcm"].combine_chunks()
    # .values (not .flatten()): aligned with the offsets buffer even if
    # null or sliced rows appear — flatten() compacts values and would
    # misalign the span math
    flat = np.asarray(pcm.values, dtype=np.float32)
    offs = pcm.offsets.to_numpy(zero_copy_only=False)
    n = len(pcm)
    # verify-by-roundtrip against the decode contract's own constant
    # (decode_batch: pcm = int16 · float32(1/32767)): a row qualifies
    # iff every sample reconstructs BIT-exactly from its nearest int16
    # under that same multiply.  pcm16/wav/flac/adpcm sources (and any
    # slice transform of them) qualify; mulaw/alaw/pcm8/f32 grids and
    # gain-scaled audio fall back to float32 automatically.
    inv = np.float32(1.0 / 32767.0)
    nh = np.rint(flat * np.float32(32767.0))
    elem_ok = (np.abs(nh) <= np.float32(32767.0)) & (
        nh.astype(np.float32) * inv == flat)
    # -0.0 compares equal to +0.0 but reconstructs as +0.0 — exclude it
    # or the bit-identity contract breaks (review-found)
    elem_ok &= ~np.signbit(flat) | (flat != np.float32(0.0))
    lens = np.diff(offs)
    # per-row all(): count of ok elements == row length
    row_ok = np.add.reduceat(
        elem_ok, offs[:-1].clip(0, max(len(elem_ok) - 1, 0))
    ) == lens if len(elem_ok) else np.zeros(n, bool)
    row_ok &= lens > 0  # empty rows stay on the float side (no benefit)
    valid = np.asarray(pc.is_valid(pcm))
    row_ok &= valid
    if not row_ok.any():
        return heavy.append_column(
            "pcm_q", pa.nulls(n, pa.large_list(pa.int16())))
    # pcm_q: qualifying rows' samples as int16
    q_lens = np.where(row_ok, lens, 0)
    q_offs = np.zeros(n + 1, np.int64)
    np.cumsum(q_lens, out=q_offs[1:])
    take = _span_gather_idx(offs[:-1][row_ok], lens[row_ok])
    q_flat = nh[take].astype(np.int16)
    pcm_q = pa.LargeListArray.from_arrays(
        pa.array(q_offs, pa.int64()), pa.array(q_flat, pa.int16()),
        mask=pa.array(~row_ok),
    )
    # pcm: remaining rows only (quantized rows null out)
    f_keep = valid & ~row_ok
    f_lens = np.where(f_keep, lens, 0)
    f_offs = np.zeros(n + 1, np.int64)
    np.cumsum(f_lens, out=f_offs[1:])
    take_f = _span_gather_idx(offs[:-1][f_keep], lens[f_keep])
    pcm_f = pa.LargeListArray.from_arrays(
        pa.array(f_offs, pa.int64()),
        pa.array(flat[take_f], pa.float32()),
        mask=pa.array(~f_keep) if not f_keep.all() else None,
    )
    i = heavy.schema.get_field_index("pcm")
    return heavy.set_column(i, "pcm", pcm_f).append_column("pcm_q", pcm_q)


def _merge_quantized_pcm(matched: pa.Table) -> pa.Table:
    """(pcm: float32|null, pcm_q: int16|null) → one float32 ``pcm``
    column — the read-side inverse of ``_quantize_pcm_lossless``
    (·float32(1/32767), the decode constant).  Rows null in BOTH stay
    null (in-flight padding)."""
    pf = matched["pcm"].combine_chunks()
    pq_ = matched["pcm_q"].combine_chunks()
    n = len(pf)
    vf = np.asarray(pc.is_valid(pf))
    vq = np.asarray(pc.is_valid(pq_))
    f_flat = np.asarray(pf.values, dtype=np.float32)
    f_offs = pf.offsets.to_numpy(zero_copy_only=False)
    q_flat = np.asarray(pq_.values, dtype=np.int16)
    q_offs = pq_.offsets.to_numpy(zero_copy_only=False)
    f_lens = np.where(vf, np.diff(f_offs), 0)
    q_lens = np.where(vq, np.diff(q_offs), 0)
    lens = f_lens + q_lens  # disjoint by construction
    offs = np.zeros(n + 1, np.int64)
    np.cumsum(lens, out=offs[1:])
    out = np.empty(offs[-1], np.float32)
    tgt_f = _span_gather_idx(offs[:-1][vf], f_lens[vf])
    src_f = _span_gather_idx(f_offs[:-1][vf], f_lens[vf])
    out[tgt_f] = f_flat[src_f]
    tgt_q = _span_gather_idx(offs[:-1][vq], q_lens[vq])
    src_q = _span_gather_idx(q_offs[:-1][vq], q_lens[vq])
    out[tgt_q] = q_flat[src_q].astype(np.float32) * np.float32(1.0 / 32767.0)
    merged = pa.LargeListArray.from_arrays(
        pa.array(offs, pa.int64()), pa.array(out, pa.float32()),
        mask=pa.array(~(vf | vq)) if not (vf | vq).all() else None,
    )
    i = matched.schema.get_field_index("pcm")
    return matched.set_column(i, "pcm", merged).drop_columns(["pcm_q"])


def _span_gather_idx(starts: np.ndarray, lens: np.ndarray) -> np.ndarray:
    """Flat gather indices for variable-length spans: concat of
    [start, start+len) ranges — the arange/repeat pattern.  Zero-length
    spans contribute nothing (they would otherwise corrupt the
    difference seeding — found by the hypothesis roundtrip property)."""
    m = lens > 0
    if not m.all():
        starts, lens = starts[m], lens[m]
    if not len(starts):
        return np.empty(0, np.int64)
    total = int(lens.sum())
    out = np.ones(total, np.int64)
    ends = np.cumsum(lens)
    out[0] = starts[0]
    out[ends[:-1]] = starts[1:] - (starts[:-1] + lens[:-1] - 1)
    return np.cumsum(out)


def trim_payload(heavy: pa.Table) -> pa.Table:
    """Shipped ``payload_transform``: trim leading/trailing silence from
    each staged clip (frame-RMS span, `audio_curation.trim_silence`),
    updating ``n_samples`` and appending ``trimmed_ms`` — curation at
    ingest.  Deterministic (pure function of the rows), so epoch replay
    re-produces identical fragments."""
    import pyarrow.compute as pc2

    from ..stages.audio_curation import trim_silence

    out = trim_silence(heavy)
    i = out.column_names.index("n_samples")
    return out.set_column(
        i, "n_samples",
        pc2.cast(pc2.list_value_length(out["pcm"]), pa.int32()),
    )


def read_replicated(out_root: str, with_payload: bool = True) -> pa.Table:
    """The logical replicated table: light finalize rows ⨝ payload on seq.

    Only rows the state tier has emitted (finalized transcript, deleted
    flag) are visible; a payload row without a finalize row is in-flight
    and not visible.  Conversely a finalize row whose payload fragment is
    not yet committed (reading an output mid-run, between an epoch's
    close and its payload flush) surfaces with NULL heavy columns —
    streaming visibility semantics, never an error.
    """
    light = Table(os.path.join(out_root, "replicated")).to_arrow()
    if not with_payload:
        return light
    payload = Table(os.path.join(out_root, "payload")).to_arrow()
    if payload.num_rows == 0:
        return light
    # manual index join (Arrow's hash join rejects large_list payloads);
    # null indices in `take` produce null rows, giving the null padding
    import pandas as pd

    pos = pd.Series(
        np.arange(payload.num_rows), index=payload["seq"].to_numpy(zero_copy_only=False)
    )
    take_idx = pos.reindex(light["seq"].to_numpy(zero_copy_only=False)).to_numpy()
    mask = ~pd.isna(take_idx)
    idx = pa.array(
        np.where(mask, take_idx, 0).astype(np.int64), mask=~mask
    )
    matched = payload.take(idx)
    if "bytes" in matched.column_names:
        # passthrough fragments hold the ENCODED source payload; rebuild
        # the decoded pcm here, bit-identically through the same decode
        # kernels that validated it at ingest (in-flight null rows stay
        # null — streaming visibility, not an error)
        matched = _reconstruct_pcm(matched)
    if "pcm_q" in matched.column_names:
        # transform-path fragments: merge the lossless int16 rows back
        # into one float32 pcm column (exact: ·2⁻¹⁵)
        matched = _merge_quantized_pcm(matched)
    out = light
    for c in matched.column_names:
        if c == "seq":
            continue
        out = out.append_column(c, matched[c].combine_chunks())
    return out


def _reconstruct_pcm(matched: pa.Table) -> pa.Table:
    """(bytes, codec, sr_hz, …) payload rows → (pcm, …): decode the
    non-null rows in one vectorized pass and scatter into a null-padded
    ``large_list<float32>`` column, preserving the pre-passthrough
    logical shape (bytes/codec/sr_hz dropped, pcm in their place)."""
    import pyarrow.compute as pc2

    from ..audio import decode_batch

    n = matched.num_rows
    valid = pc2.is_valid(matched["bytes"]).to_numpy(zero_copy_only=False)
    vi = np.flatnonzero(valid)
    lengths = np.zeros(n, np.int64)
    if len(vi):
        sub = matched.take(pa.array(vi))
        pcm, _err = decode_batch(
            sub["bytes"].combine_chunks(), sub["codec"], sub["sr_hz"])
        if _err.null_count != len(_err):
            # every staged payload decoded cleanly at ingest — a re-decode
            # failure here means corruption at rest; surface it loudly
            # rather than returning silently-empty audio
            import pyarrow.compute as _pc2

            bad = _pc2.drop_null(_err).to_pylist()[:3]
            raise ValueError(
                f"payload fragment re-decode failed for "
                f"{len(_err) - _err.null_count} rows (corruption at "
                f"rest?): {bad}")
        pcm = pcm.combine_chunks() if isinstance(pcm, pa.ChunkedArray) else pcm
        flat = pcm.flatten()
        offs = pcm.offsets.to_numpy(zero_copy_only=False)
        lengths[vi] = np.diff(offs)
        values = flat
    else:
        values = pa.array([], pa.float32())
    offsets = np.zeros(n + 1, np.int64)
    np.cumsum(lengths, out=offsets[1:])
    pcm_full = pa.LargeListArray.from_arrays(
        pa.array(offsets, pa.int64()), values,
        mask=pa.array(~valid) if (~valid).any() else None,
    )
    if "pcm" in matched.column_names:
        # mixed-version payload table (pre-passthrough float fragments
        # concatenated with passthrough ones): rows with a stored pcm
        # keep it, rows with bytes get the decoded one
        old = matched["pcm"].combine_chunks()
        vo = np.asarray(pc2.is_valid(old))
        o_flat = np.asarray(old.values, dtype=np.float32)
        o_offs = old.offsets.to_numpy(zero_copy_only=False)
        d_offs = pcm_full.offsets.to_numpy(zero_copy_only=False)
        d_flat = np.asarray(pcm_full.values, dtype=np.float32)
        vd = np.asarray(pc2.is_valid(pcm_full))
        o_lens = np.where(vo, np.diff(o_offs), 0)
        d_lens = np.where(vd & ~vo, np.diff(d_offs), 0)
        lens2 = o_lens + d_lens
        offs2 = np.zeros(n + 1, np.int64)
        np.cumsum(lens2, out=offs2[1:])
        out2 = np.empty(offs2[-1], np.float32)
        t_o = _span_gather_idx(offs2[:-1][vo], o_lens[vo])
        s_o = _span_gather_idx(o_offs[:-1][vo], o_lens[vo])
        out2[t_o] = o_flat[s_o]
        keep_d = vd & ~vo
        t_d = _span_gather_idx(offs2[:-1][keep_d], d_lens[keep_d])
        s_d = _span_gather_idx(d_offs[:-1][keep_d], d_lens[keep_d])
        out2[t_d] = d_flat[s_d]
        pcm_full = pa.LargeListArray.from_arrays(
            pa.array(offs2, pa.int64()), pa.array(out2, pa.float32()),
            mask=pa.array(~(vo | vd)) if not (vo | vd).all() else None,
        )
    out_cols, out_names = [], []
    for c in matched.column_names:
        if c == "bytes":
            out_names.append("pcm")
            out_cols.append(pcm_full)
        elif c in ("codec", "sr_hz", "pcm"):
            continue
        else:
            out_names.append(c)
            out_cols.append(matched[c].combine_chunks())
    return pa.table(dict(zip(out_names, out_cols)))


def read_windows_live(out_root: str, kind: str = "windows"):
    """The coherent incremental window view (``early_fire=True`` runs):
    the windows (or, with ``kind="sliding"``, sliding) sink's EXACT
    close-time rows, overlaid with the latest provisional totals for
    cells not yet closed.  Returns a pandas frame with a ``provisional``
    bool column; converges to exactly the final sink as the stream
    drains."""
    import pandas as pd

    if kind not in ("windows", "sliding"):
        raise ValueError(f"kind must be windows|sliding, got {kind!r}")
    final = Table(os.path.join(out_root, kind)).to_arrow().to_pandas()
    base_cols = ["clip_id", "window_start", "window_end", "n_clips",
                 "sum_dur_ms"]
    final = (final[[c for c in base_cols if c in final.columns]]
             if len(final) else pd.DataFrame(columns=base_cols))
    out = final.assign(provisional=False)
    live = Table(
        os.path.join(out_root, f"{kind}_live")).to_arrow().to_pandas()
    if len(live):
        live = (live.sort_values("epoch", kind="mergesort")
                .drop_duplicates(["clip_id", "window_start"], keep="last"))
        closed = set(zip(out["clip_id"], out["window_start"]))
        keep = ~pd.MultiIndex.from_frame(
            live[["clip_id", "window_start"]]).isin(closed)
        extra = live.loc[keep, base_cols].assign(provisional=True)
        out = pd.concat([out, extra], ignore_index=True)
    return out.sort_values(["clip_id", "window_start"]).reset_index(
        drop=True)


def read_sessions_live(out_root: str):
    """Coherent session view for ``early_fire`` runs: the sessions
    sink's exact closed rows, plus the LATEST epoch's provisional open
    sessions (older provisional rows are superseded snapshots; a drained
    stream has closed everything, so only finals remain)."""
    import pandas as pd

    cols = ["clip_id", "session_start", "session_end", "n_clips",
            "sum_dur_ms"]
    final = Table(os.path.join(out_root, "sessions")).to_arrow().to_pandas()
    final = (final[[c for c in cols if c in final.columns]]
             if len(final) else pd.DataFrame(columns=cols))
    out = final.assign(provisional=False)
    state = Table(os.path.join(out_root, "replicated")).pipeline_state(
        "replicate")
    if not bool(state.get("flushed", False)):
        live = Table(os.path.join(out_root, "sessions_live")) \
            .to_arrow().to_pandas()
        if len(live):
            live = live[live["epoch"] == live["epoch"].max()]
            out = pd.concat(
                [out, live[cols].assign(provisional=True)],
                ignore_index=True)
    return out.sort_values(["clip_id", "session_start"]).reset_index(
        drop=True)


def read_lineage(out_root: str, name: str = "replicate") -> list[dict]:
    """Committed per-epoch lineage from the side log: one entry per epoch
    ≤ the main sink's committed epoch.  The log is one immutable JSON
    object per epoch (``_lineage/<name>/e{epoch}.json`` — appending to a
    shared file would need an append primitive object stores lack); a
    replayed epoch's duplicate write no-ops on the conditional PUT, and
    deterministic replay makes the kept first write equivalent.  The
    legacy single-file ``<name>.jsonl`` layout is still read if present."""
    from ..fs import fexists, fget, flist

    t = Table(os.path.join(out_root, "replicated"))
    committed = t.committed_epoch(name)
    ents: dict[int, dict] = {}
    legacy = os.path.join(out_root, "_lineage", f"{name}.jsonl")
    if fexists(legacy):
        for line in fget(legacy).decode().splitlines():
            line = line.strip()
            if not line:
                continue
            try:
                e = json.loads(line)
            except json.JSONDecodeError:
                continue
            if e.get("epoch") is not None and e["epoch"] <= committed:
                ents[e["epoch"]] = e
    d = os.path.join(out_root, "_lineage", name)
    for fn in flist(d):
        if not fn.endswith(".json") or fn.startswith("."):
            continue
        try:
            e = json.loads(fget(os.path.join(d, fn)))
        except (json.JSONDecodeError, FileNotFoundError):
            continue
        if e.get("epoch") is not None and e["epoch"] <= committed:
            ents[e["epoch"]] = e
    return [ents[e] for e in sorted(ents)]


class ReplicatePipeline:
    SINKS = ("replicated", "payload", "windows", "sliding",
             "sessions", "funnels", "changelog", "dlq", "views",
             "windows_live", "sliding_live", "sessions_live")
    MAIN = "replicated"

    def __init__(
        self,
        clips_root: str,
        out_root: str,
        cfg: ReplicateConfig | None = None,
        updates_root: str | None = None,
        name: str = "replicate",
    ):
        self.cfg = cfg or ReplicateConfig()
        self.name = name
        self.clips = Table(clips_root)
        self.updates = Table(updates_root) if updates_root else None
        self.out_root = out_root
        self.sink = {s: Table.create(os.path.join(out_root, s)) for s in self.SINKS}
        self.ckpt_root = os.path.join(out_root, "_checkpoints")
        # partition-state base dir: ``ckpt_root/<layout>`` once a rescale
        # committed a new layout generation (state key "ckpt_layout");
        # resolved from committed state at run() start.  Dedup/near-dup
        # shard tiers are content-hash keyed (independent of partition
        # count) and always live at ckpt_root itself.
        self.part_root = self.ckpt_root
        self.actors = []
        self.frontiers: dict[str, int] = {}
        self._nonce_counter = 0
        self._nonces: dict[int, int] = {}
        # sticky hot-key state (persisted in the main sink's commit)
        self._hot: set[str] = set()
        self._hot_copied: dict[str, int] = {}
        self._key_counts: dict[str, int] = {}
        self._total_clips = 0
        self._hot_metrics: dict[str, int] = {}
        # cross-epoch dedup tier (cfg.dedup)
        self.dedup_shards = []
        self._dedup_metrics: dict[str, int] = {}
        self._dedup_epoch_dropped: dict[int, int] = {}
        # cross-epoch near-dup tier (cfg.neardup)
        self.neardup_shards = []
        self._neardup_epoch_dropped: dict[int, int] = {}

    # ----------------------------------------------------------- lifecycle
    def _spawn_actors(self):
        import ray  # noqa: F401

        cls = PartitionStateActor()
        cfg = self.cfg
        sink_roots = {s: t.uri for s, t in self.sink.items()}
        # SPREAD: balance partition actors across cluster nodes (a no-op
        # in single-node local mode; on a real cluster it keeps one
        # node's failure from taking out every partition's state)
        self.actors = [
            cls.options(num_cpus=cfg.actor_num_cpus,
                        scheduling_strategy="SPREAD").remote(
                p, _StateCfg(cfg), sink_roots, self.part_root
            )
            for p in range(cfg.num_partitions)
        ]
        # placement record (survives teardown — ops/test introspection)
        self.actor_nodes = ray.get([a.node_id.remote() for a in self.actors])
        if cfg.dedup:
            from ..state.dedup_index import DedupShardActor

            dcls = DedupShardActor()
            self.dedup_shards = [
                dcls.options(num_cpus=0.1).remote(
                    d, self.ckpt_root, cfg.dedup_retention_ms
                )
                for d in range(cfg.num_dedup_shards)
            ]
        if cfg.neardup:
            from ..state.neardup_index import NearDupShardActor

            if cfg.neardup_signature == "minhash":
                if not 1 <= cfg.neardup_min_band_matches <= cfg.neardup_bands:
                    raise ValueError(
                        "neardup_min_band_matches must be in "
                        "[1, neardup_bands] (≥1 shared lane is what the "
                        "band buckets can find)"
                    )
            elif cfg.neardup_max_hamming >= cfg.neardup_bands:
                raise ValueError(
                    "neardup_max_hamming must be < neardup_bands "
                    "(pigeonhole recall guarantee)"
                )
            ncls = NearDupShardActor()
            self.neardup_shards = [
                ncls.options(num_cpus=0.1).remote(
                    d, self.ckpt_root, self._neardup_threshold(),
                    cfg.neardup_retention_ms, self._neardup_metric(),
                )
                for d in range(cfg.num_neardup_shards)
            ]

    def _neardup_metric(self) -> str:
        return "lanes" if self.cfg.neardup_signature == "minhash" else "bits"

    def _neardup_threshold(self) -> int:
        """Max distance in the active metric's units: bit-Hamming for
        audio_fp/simhash, unequal lanes (= bands − min matches) for the
        banded-minhash mode."""
        cfg = self.cfg
        if cfg.neardup_signature == "minhash":
            return cfg.neardup_bands - cfg.neardup_min_band_matches
        return cfg.neardup_max_hamming

    def _shutdown_actors(self):
        import ray

        for a in self.actors + self.dedup_shards + self.neardup_shards:
            ray.kill(a, no_restart=True)
        self.actors = []
        self.dedup_shards = []
        self.neardup_shards = []

    # ---------------------------------------------------------------- run
    def _next_slice(self, clips_v: int, updates_v: int):
        clips_latest = self.clips.latest_version() or 0
        updates_latest = self.updates.latest_version() or 0 if self.updates else 0
        cv = min(clips_v + self.cfg.max_versions_per_epoch, clips_latest)
        uv = min(updates_v + self.cfg.max_versions_per_epoch, updates_latest)
        return cv, uv, (cv > clips_v or uv > updates_v)

    def run(self, max_epochs: int | None = None) -> dict:
        """Process all available source data (resuming if needed), then
        flush.  Returns the final merged metrics.

        In ``ingest_mode="tasks"`` consecutive epochs PIPELINE: epoch
        e+1's decode/transfer/payload-staging tasks launch as soon as
        epoch e's watermark is known and overlap e's close/checkpoint/
        commit.  Actors stash e+1 rows and apply them at close(e+1), so
        state transitions stay epoch-atomic and replay-deterministic.
        """
        import ray

        state = self.sink[self.MAIN].pipeline_state(self.name)
        committed = int(state.get("last_epoch", -1))
        swap = state.get("rescale_swap")
        if swap:
            # legacy (pre-layout-generation) trees only: the dir-swap
            # rescale could crash mid-swap; refuse to resume over it
            raise RuntimeError(
                f"a state rescale ({swap.get('old')}→{swap.get('new')} "
                "partitions) crashed mid-swap; re-run rescale_state, or "
                f"restore the p* dirs from backup {swap.get('backup')!r} "
                "and clear 'rescale_swap' via update_pipeline_state"
            )
        layout = str(state.get("ckpt_layout", "") or "")
        self.part_root = (
            os.path.join(self.ckpt_root, layout) if layout else self.ckpt_root
        )
        stored_p = int(state.get("num_partitions", 0))
        if committed >= 0 and stored_p and stored_p != self.cfg.num_partitions:
            raise ValueError(
                f"committed state has num_partitions={stored_p} but config "
                f"says {self.cfg.num_partitions}; partition count is state "
                "layout — run hydra_ray.state.rescale.rescale_state first"
            )
        if committed >= 0 and stored_p and _fs.fisdir(self.part_root):
            # a checkpoint layout that disagrees with the committed
            # partition count must be refused, never silently restored
            actual = sum(
                1 for d in _fs.flist(self.part_root)
                if d.startswith("p") and d[1:].isdigit()
            )
            if actual != stored_p:
                raise RuntimeError(
                    f"checkpoint layout {self.part_root} has {actual} p* "
                    f"dirs but committed state records num_partitions="
                    f"{stored_p} — layout is inconsistent; re-run "
                    "rescale_state (or point ckpt_layout back at a "
                    "consistent generation via update_pipeline_state)"
                )
        for t in self.sink.values():
            t.gc_staged()
        self._spawn_actors()
        try:
            if committed >= 0:
                ray.get(
                    [a.restore.remote(committed) for a in self.actors]
                    + [d.restore.remote(committed) for d in self.dedup_shards]
                    + [d.restore.remote(committed) for d in self.neardup_shards]
                )
            epoch = committed + 1
            clips_v = int(state.get("clips_version", 0))
            updates_v = int(state.get("updates_version", 0))
            wm = int(state.get("watermark", -(1 << 62)))
            self.frontiers = {
                k: int(v) for k, v in state.get("frontiers", {}).items()
            }
            self._hot = set(state.get("hot_keys", []))
            self._hot_copied = {}  # resume re-copies hot buffers (idempotent)
            self._key_counts = {k: int(c) for k, c in state.get("hot_key_counts", [])}
            self._total_clips = int(state.get("total_clips", 0))
            self._hot_metrics = {
                k: int(v) for k, v in state.get("hot_metrics", {}).items()
            }
            self._dedup_metrics = {
                k: int(v) for k, v in state.get("dedup_metrics", {}).items()
            }
            flushed = bool(state.get("flushed", False))
            metrics: dict = {}
            n_epochs = 0
            pre: tuple | None = None  # (epoch, refs, cv, uv)
            while True:
                if max_epochs is not None and n_epochs >= max_epochs:
                    break
                cv, uv, has_data = self._next_slice(clips_v, updates_v)
                if not has_data:
                    if flushed:
                        break
                    metrics = self._finish_epoch(
                        epoch, [], [], clips_v, clips_v, updates_v, updates_v,
                        wm, WATERMARK_MAX, flush=True,
                    )
                    flushed = True
                    epoch += 1
                    n_epochs += 1
                    break
                if pre is not None and pre[0] == epoch and pre[2:] == (cv, uv):
                    refs = pre[1]
                else:
                    if pre is not None and pre[1][0] in ("refs", "dedup"):
                        # discarded pre-launch: cancel what hasn't run; any
                        # stash it already made carries a dead nonce and is
                        # dropped at close/resolve (never double-applied)
                        stale = (
                            pre[1][1] if pre[1][0] == "refs" else pre[1][1][0]
                        )
                        for r in stale:
                            ray.cancel(r, force=False, recursive=False)
                    refs = self._launch_ingest(epoch, clips_v, cv, updates_v, uv, wm)
                pre = None
                import time as _time

                _t0 = _time.perf_counter()
                acks, pay_frags = self._collect_acks(refs, epoch)
                if os.environ.get("HYDRA_DEBUG_TIMING"):
                    import sys as _sys

                    print(
                        f"[epoch {epoch}] ingest_wall={_time.perf_counter() - _t0:.2f}s",
                        file=_sys.stderr,
                    )
                wm_new = self._advance_watermark(wm, acks)
                # pipeline: overlap the NEXT epoch's ingest with this close
                if self.cfg.pipeline_epochs and self.cfg.ingest_mode == "tasks":
                    ncv, nuv, nhas = self._next_slice(cv, uv)
                    if nhas:
                        pre = (
                            epoch + 1,
                            self._launch_ingest(epoch + 1, cv, ncv, uv, nuv, wm_new),
                            ncv,
                            nuv,
                        )
                _t1 = _time.perf_counter()
                metrics = self._finish_epoch(
                    epoch, acks, pay_frags, clips_v, cv, updates_v, uv, wm, wm_new
                )
                if os.environ.get("HYDRA_DEBUG_TIMING"):
                    import sys as _sys

                    print(
                        f"[epoch {epoch}] finish_wall="
                        f"{_time.perf_counter() - _t1:.2f}s",
                        file=_sys.stderr,
                    )
                wm = metrics["__watermark"]
                clips_v, updates_v = cv, uv
                flushed = False
                epoch += 1
                n_epochs += 1
            return {
                k: v for k, v in metrics.items() if not k.startswith("__")
            } | {"epochs": epoch, "watermark": wm}
        finally:
            self._shutdown_actors()

    def _advance_watermark(self, wm_prev: int, acks: list) -> int:
        """Monotone per-source frontiers → wm = min(frontiers) − lateness."""
        for a in acks:
            s = a["source"]
            self.frontiers[s] = max(self.frontiers.get(s, a["max_ts"]), a["max_ts"])
        if not self.frontiers:
            return wm_prev
        return max(
            wm_prev, min(self.frontiers.values()) - self.cfg.allowed_lateness_ms
        )

    def _launch_ingest(
        self,
        epoch: int,
        clips_from: int,
        clips_to: int,
        updates_from: int,
        updates_to: int,
        wm_prev: int,
    ):
        """Fire the epoch's ingest (non-blocking in tasks mode).

        Each launch gets a fresh nonce, recorded as the authoritative one
        for its epoch; if a pre-launched slice is discarded (source grew
        between pre-launch and the real slice computation), its stale
        stashes carry a dead nonce and close_epoch ignores them.
        """
        cfg = self.cfg
        self._nonce_counter += 1
        nonce = self._nonce_counter
        self._nonces[epoch] = nonce
        hot = frozenset(self._hot) if cfg.hot_key_threshold else frozenset()
        if hot:
            # ship already-buffered updates of newly-hot keys to their salt
            # partitions (stashed under this launch's nonce; idempotent —
            # duplicate copies collapse in the max-(ts, rev) join/view)
            newly = sorted(
                k for k in hot
                if self._hot_copied.get(k, epoch) == epoch
            )
            if newly:
                self._copy_hot_buffers(newly, epoch, nonce)
                for k in newly:
                    self._hot_copied[k] = epoch
        if (cfg.dedup or cfg.neardup) and clips_to > clips_from:
            # two-phase: the column-pruned hash pass and/or the decode+
            # fingerprint pass run first (they can pre-launch and overlap
            # the previous epoch's close); the routed ingest launches
            # after resolve with the merged drop set
            refs = (
                self._launch_hash_pass(epoch, clips_from, clips_to, nonce)
                if cfg.dedup
                else []
            )
            refs += (
                self._launch_fp_pass(epoch, clips_from, clips_to, nonce)
                if cfg.neardup
                else []
            )
            return (
                "dedup",
                (refs, epoch, nonce, clips_from, clips_to,
                 updates_from, updates_to, wm_prev),
            )
        return self._launch_routed(
            epoch, clips_from, clips_to, updates_from, updates_to,
            wm_prev, nonce, None,
        )

    def _launch_hash_pass(self, epoch, clips_from, clips_to, nonce):
        from ..state.dedup_index import hash_pass_task

        task = hash_pass_task()
        cols = list(self.cfg.dedup_cols)
        return [
            task.remote(
                self.clips.fragment_paths([f]), self.dedup_shards,
                epoch, nonce, cols,
            )
            for f in self.clips.read_fragments(clips_from, clips_to)
        ]

    def _launch_fp_pass(self, epoch, clips_from, clips_to, nonce):
        from ..state.neardup_index import fp_pass_task

        task = fp_pass_task()
        refs = []
        for f in self.clips.read_fragments(clips_from, clips_to):
            # decode dominates this pass: fan a big fragment out across
            # row-window tasks (each re-reads the pruned columns, ~0.1 s)
            n_parts = max(1, min(8, -(-f.rows // 512)))
            step = -(-f.rows // n_parts)
            for p in range(n_parts):
                refs.append(
                    task.remote(
                        self.clips.fragment_paths([f]), self.neardup_shards,
                        epoch, nonce, self.cfg.neardup_bands,
                        row_lo=p * step, row_cnt=step,
                        signature=self.cfg.neardup_signature,
                    )
                )
        return refs

    def _launch_routed(
        self, epoch, clips_from, clips_to, updates_from, updates_to,
        wm_prev, nonce, drop,
    ):
        cfg = self.cfg
        hot = frozenset(self._hot) if cfg.hot_key_threshold else frozenset()
        clips_route = _route_factory(
            self.actors, "clips", wm_prev, "clip_id", cfg.num_partitions,
            # keep_bytes enables passthrough payload staging (stage the
            # encoded source bytes, not float32 PCM) when no transform
            # rewrites the audio — see _Router.__call__.  When nothing
            # in-flight consumes decoded samples (no transform/filter/
            # features), skip materializing them entirely: identical
            # validation + n_samples, no 4 B/sample buffer ever built.
            decoder=AudioDecoder(
                record_size_limit=cfg.record_size_limit,
                keep_bytes=cfg.payload_transform is None,
                materialize_pcm=(
                    cfg.payload_transform is not None
                    or cfg.payload_filter is not None
                    or cfg.audio_features
                    or cfg.audio_fbank
                ),
            ),
            payload_root=self.sink["payload"].uri,
            epoch=epoch,
            nonce=nonce,
            hot_keys=hot,
            n_salts=cfg.n_salts,
            drop=drop,
            funnel_on=bool(cfg.funnel_steps),
            features=cfg.audio_features,
            fbank=cfg.audio_fbank,
            payload_transform=cfg.payload_transform,
            payload_filter=cfg.payload_filter,
            distinct_k=(cfg.window_distinct_k or cfg.window_mode_k),
            content_cols=cfg.dedup_cols,
        )
        updates_route = _route_factory(
            self.actors, "updates", wm_prev, "clip_id", cfg.num_partitions,
            epoch=epoch,
            nonce=nonce,
            hot_keys=hot,
            n_salts=cfg.n_salts,
        )
        if cfg.ingest_mode == "tasks":
            import ray

            task = _ingest_task_fn()
            refs = []
            if clips_to > clips_from:
                # ship the router once per epoch (object store), not
                # re-pickled into every task submission
                route_ref = ray.put(clips_route)
                for f in self.clips.read_fragments(clips_from, clips_to):
                    refs.append(
                        task.remote(
                            self.clips.fragment_paths([f]), route_ref,
                            cfg.batch_size, None,
                        )
                    )
            if self.updates and updates_to > updates_from:
                route_ref = ray.put(updates_route)
                for f in self.updates.read_fragments(updates_from, updates_to):
                    refs.append(
                        task.remote(
                            self.updates.fragment_paths([f]), route_ref,
                            cfg.batch_size * 8, None,
                        )
                    )
            return ("refs", refs)
        ack_tables = []
        if clips_to > clips_from:
            ds = self.clips.to_dataset(after_version=clips_from, version=clips_to)
            ds = ds.map_batches(
                _per_batch_route(clips_route),
                batch_format="pyarrow",
                batch_size=cfg.batch_size,
                max_retries=0,  # epoch-level retry owns failure handling
            )
            ack_tables.append(ds)
        if self.updates and updates_to > updates_from:
            ds = self.updates.to_dataset(
                after_version=updates_from, version=updates_to
            )
            ds = ds.map_batches(
                _per_batch_route(updates_route),
                batch_format="pyarrow",
                batch_size=cfg.batch_size * 8,
                max_retries=0,
            )
            ack_tables.append(ds)
        return ("datasets", ack_tables)

    def _copy_hot_buffers(self, keys: list[str], epoch: int, nonce: int):
        """Fan a newly-hot key's buffered update revisions from its home
        partition to its salt partitions, as replica ingests stashed for
        ``epoch`` under this launch's nonce."""
        import ray

        P = self.cfg.num_partitions
        keys_np = np.asarray(keys, dtype=object)
        homes = partition_for(keys_np, P)
        by_home: dict[int, list[str]] = {}
        for k, h in zip(keys, homes):
            by_home.setdefault(int(h), []).append(k)
        fetched = ray.get(
            [self.actors[h].buffered_updates_for.remote(ks) for h, ks in by_home.items()]
        )
        refs = []
        for (h, _ks), res in zip(by_home.items(), fetched):
            if res is None:
                continue
            ukeys, uts, urev, utext = res
            targets: dict[int, set] = {}
            hk = ukeys.astype(str)
            for s in range(self.cfg.n_salts):
                salted = np.char.add(hk, f"#{s}").astype(object)
                ps = (hash64(salted) % np.uint64(P)).astype(np.int64)
                for i, p in enumerate(ps):
                    if int(p) != h:
                        targets.setdefault(int(p), set()).add(i)
            for p, idx in targets.items():
                sel = np.array(sorted(idx), dtype=np.int64)
                tbl = pa.table(
                    {
                        "clip_id": pa.array(ukeys[sel], pa.string()),
                        "transcript": pa.array(utext[sel], pa.string()),
                        "revision": pa.array(urev[sel].astype(np.int32), pa.int32()),
                        "event_ts": pa.array(uts[sel], pa.timestamp("ms")),
                        "__replica": pa.array(np.ones(len(sel), dtype=bool)),
                    }
                )
                refs.append(
                    self.actors[p].ingest.remote(
                        "updates", tbl, -(1 << 62), epoch, nonce
                    )
                )
        if refs:
            ray.get(refs)

    def _collect_acks(self, launched, epoch: int) -> tuple[list, list]:
        """→ (ack dicts, payload fragment json strings)."""
        import ray

        kind, payload = launched
        acks: list = []
        frags: list = []
        if kind == "dedup":
            # phase 2: hash/fingerprint passes done → resolve drop sets →
            # routed ingest with their union
            refs, ep, nonce, cf, ct, uf, ut, wm_prev = payload
            ray.get(refs)
            drop_parts = []
            if self.dedup_shards:
                resolved = ray.get(
                    [d.resolve.remote(ep, dict(self._nonces), wm_prev)
                     for d in self.dedup_shards]
                )
                drop_parts += [r[0] for r in resolved if len(r[0])]
                dropped = int(sum(st["dropped"] for _, st in resolved))
                new_hashes = int(sum(st["new"] for _, st in resolved))
                self._dedup_metrics["dedup_dropped"] = (
                    self._dedup_metrics.get("dedup_dropped", 0) + dropped
                )
                self._dedup_metrics["dedup_new_hashes"] = (
                    self._dedup_metrics.get("dedup_new_hashes", 0) + new_hashes
                )
                self._dedup_epoch_dropped[ep] = dropped
            if self.neardup_shards:
                from ..state.neardup_index import resolve_near_epoch

                kept, ndrop = resolve_near_epoch(
                    self.neardup_shards, ep, dict(self._nonces),
                    self.cfg.neardup_bands, self._neardup_threshold(),
                    wm_prev, self._neardup_metric(),
                )
                if len(ndrop):
                    drop_parts.append(ndrop)
                self._dedup_metrics["neardup_dropped"] = (
                    self._dedup_metrics.get("neardup_dropped", 0) + len(ndrop)
                )
                self._dedup_metrics["neardup_kept"] = (
                    self._dedup_metrics.get("neardup_kept", 0) + len(kept)
                )
                self._neardup_epoch_dropped[ep] = len(ndrop)
            drop = (
                np.unique(np.concatenate(drop_parts)) if drop_parts else None
            )
            launched = self._launch_routed(ep, cf, ct, uf, ut, wm_prev, nonce, drop)
            return self._collect_acks(launched, ep)
        if kind == "refs":
            for chunk in ray.get(payload):
                acks.extend(chunk["acks"])
                frags.extend(chunk["frags"])
        elif payload:
            combined = payload[0]
            for other in payload[1:]:
                combined = combined.union(other)
            acks = combined.take_all()
            for a in acks:
                if a.get("payload_frag"):
                    frags.extend(a["payload_frag"].split("\x1e"))
        if acks and os.environ.get("HYDRA_DEBUG_TIMING"):
            import sys as _sys

            tasks = {}
            for a in acks:
                key = (a["source"], a["decode_s"], a["send_s"], a["ack_wait_s"])
                tasks[key] = tasks.get(key, 0) + 1
            dec = sum(k[1] for k in tasks)
            snd = sum(k[2] for k in tasks)
            ackw = sum(k[3] for k in tasks)
            print(
                f"[epoch {epoch}] tasks={len(tasks)} decode={dec:.2f}s "
                f"send={snd:.2f}s ack_wait={ackw:.2f}s (summed across tasks)",
                file=_sys.stderr,
            )
        return acks, frags

    def _finish_epoch(
        self,
        epoch: int,
        acks: list,
        pay_frags: list,
        clips_from: int,
        clips_to: int,
        updates_from: int,
        updates_to: int,
        wm_prev: int,
        wm: int,
        flush: bool = False,
    ) -> dict:
        import time as _time

        import ray

        _debug = os.environ.get("HYDRA_DEBUG_TIMING")
        _t = _time.perf_counter
        _marks = [("start", _t())]
        cfg = self.cfg
        max_ts = max(
            self.frontiers.values(), default=wm_prev + cfg.allowed_lateness_ms
        )

        if cfg.crash_at == (epoch, "before_close"):
            raise CrashPoint(f"injected crash before close of epoch {epoch}")

        # -- 4. close → staged fragments ------------------------------------
        hot_list = sorted(self._hot) if cfg.hot_key_threshold else None
        results = ray.get(
            [
                a.close_epoch.remote(epoch, wm, self._nonces, hot_list)
                for a in self.actors
            ]
        )
        self._nonces = {e: x for e, x in self._nonces.items() if e > epoch}
        # merge hot-key partials across salt partitions (driver-side: the
        # row count is bounded by hot keys × windows closed this epoch),
        # stage the merged fragments, and hand still-open merged sessions
        # back to each key's home partition BEFORE the checkpoint
        hot_staged = self._process_hot(results, epoch, wm)
        _marks.append(("close", _t()))

        if cfg.crash_at == (epoch, "after_prepare"):
            raise CrashPoint(f"injected crash after prepare of epoch {epoch}")

        # -- 5. checkpoint (full every K epochs, deltas between) ------------
        full = (epoch % max(cfg.full_checkpoint_every, 1)) == 0
        ray.get(
            [a.checkpoint.remote(epoch, wm, full) for a in self.actors]
            + [d.checkpoint.remote(epoch, full) for d in self.dedup_shards]
            + [d.checkpoint.remote(epoch, full) for d in self.neardup_shards]
        )
        self._gc_checkpoints(epoch)
        _marks.append(("checkpoint", _t()))

        # -- 6. commit (aux first, main last = source of truth) -------------
        staged: dict[str, list[FragmentMeta]] = {s: [] for s in self.SINKS}
        for r in results:
            for sink_name, frag in r["staged"].items():
                staged[sink_name].append(FragmentMeta.from_json(frag))
        for sink_name, frag in hot_staged:
            staged[sink_name].append(frag)
        if cfg.early_fire and not flush:
            for sink_name, frag in self._stage_early_windows(results, epoch):
                staged[sink_name].append(frag)
        if not flush:
            for fj in pay_frags:
                staged["payload"].append(FragmentMeta.from_json(json.loads(fj)))
        for s in self.SINKS:
            if s == self.MAIN:
                continue
            self.sink[s].commit_epoch(self.name, epoch, staged[s])

        if cfg.crash_at == (epoch, "before_main_commit"):
            raise CrashPoint(f"injected crash before main commit of epoch {epoch}")

        merged: dict = {}
        for r in results:
            for k, v in r["metrics"].items():
                merged[k] = merged.get(k, 0) + v
        for k, v in self._hot_metrics.items():
            merged[k] = merged.get(k, 0) + v
        for k, v in self._dedup_metrics.items():
            merged[k] = merged.get(k, 0) + v
        self._update_hot_detection(results, acks)
        # per-epoch lineage goes to an append-only SIDE LOG (bounded
        # manifests at any horizon); the line is written before the commit
        # so a committed epoch always has its entry, and replays write
        # duplicate epoch lines that the reader dedupes (last wins)
        lineage_entry = {
            "epoch": epoch,
            "clips": [clips_from, clips_to],
            "updates": [updates_from, updates_to],
            "wm_prev": wm_prev,
            "wm_close": wm,
        }
        if cfg.dedup:
            lineage_entry["dedup_dropped"] = self._dedup_epoch_dropped.pop(epoch, 0)
        if cfg.neardup:
            lineage_entry["neardup_dropped"] = self._neardup_epoch_dropped.pop(
                epoch, 0
            )
        self._append_lineage(lineage_entry)
        self.sink[self.MAIN].commit_epoch(
            self.name,
            epoch,
            staged[self.MAIN],
            extra_state={
                "clips_version": clips_to,
                "updates_version": updates_to,
                "watermark": wm if wm < WATERMARK_MAX else max_ts,
                "frontiers": self.frontiers,
                "flushed": flush,
                "lineage_log": os.path.join("_lineage", self.name),
                "metrics": merged,
                # sticky hot-key state: the set committed here routes the
                # NEXT epoch (and any replay of it)
                "hot_keys": sorted(self._hot),
                "hot_key_counts": sorted(
                    self._key_counts.items(), key=lambda kv: -kv[1]
                )[:1024],
                "total_clips": self._total_clips,
                "hot_metrics": dict(self._hot_metrics),
                "dedup_metrics": dict(self._dedup_metrics),
                # partition count is SEMANTIC state layout; a resume with a
                # different count must go through state.rescale first
                "num_partitions": cfg.num_partitions,
            },
        )
        _marks.append(("commit", _t()))
        if _debug:
            import sys as _sys

            spans = ", ".join(
                f"{name}={_marks[i+1][1]-_marks[i][1]:.2f}s"
                for i, (name, _) in enumerate(_marks[1:], 0)
                for name in [_marks[i + 1][0]]
            )
            print(f"[epoch {epoch}] {spans}", file=_sys.stderr)
        merged["__watermark"] = wm if wm < WATERMARK_MAX else max_ts
        # maintenance: micro-batch epochs leave one tiny fragment per
        # (sink, partition, epoch); periodic bin-pack keeps long-horizon
        # reads from paying a per-file open cost that dwarfs the data.
        # Runs strictly AFTER the commit (pure maintenance — skipping it
        # on crash is safe, replay is unaffected: the pipeline's delta
        # readers track the SOURCE tables, and compaction preserves sink
        # content + time travel by contract, test_lancelite/test_sinks).
        if cfg.compact_sinks_every and (
            (epoch + 1) % cfg.compact_sinks_every == 0
        ):
            for t in self.sink.values():
                t.compact()
                if cfg.keep_history_versions:
                    t.truncate_history(cfg.keep_history_versions)
        elif cfg.keep_history_versions and (epoch + 1) % 8 == 0:
            # history bound must not silently depend on compaction being
            # enabled: without compact_sinks_every it runs every 8 epochs
            for t in self.sink.values():
                t.truncate_history(cfg.keep_history_versions)
        return merged

    def _stage_early_windows(self, results: list, epoch: int):
        """Early-fire driver half: union the per-partition touched-cell
        sets from this close (tumbling AND sliding), fetch every
        partition's CURRENT partial totals for them in ONE RPC round
        (a salted cell's rows span partitions, and an untouched
        partition may hold a touched cell's older rows), merge
        additively, and stage one provisional fragment per live sink.
        Deterministic under replay (state is epoch-atomic) and
        routing-independent (pure addition over partition partials).
        Returns [(sink_name, FragmentMeta), ...]."""
        import ray

        import pandas as pd

        def union(key):
            tabs = [r.get(key) for r in results]
            tabs = [t for t in tabs if t is not None and t.num_rows]
            if not tabs:
                return None
            df = pa.concat_tables(tabs).to_pandas().drop_duplicates(
                ["clip_id", "window_start"])
            return pa.Table.from_pandas(df, preserve_index=False)

        w_cells = union("early_touched")
        s_cells = union("early_touched_sliding")
        skeys: set = set()
        for r in results:
            ks = r.get("early_touched_sessions")
            if ks:
                skeys.update(ks)
        # hot-key sessions were just extracted/adopted by _process_hot;
        # their open remainders live on home partitions — include the
        # whole (bounded) hot set so adoption counts as a touch
        skeys.update(self._hot)
        skeys_l = sorted(skeys) if (skeys and self.cfg.session_gap_ms) \
            else None
        if w_cells is None and s_cells is None and not skeys_l:
            return []
        parts = ray.get([
            a.render_window_cells.remote(w_cells, s_cells, skeys_l)
            for a in self.actors
        ])
        staged = []
        for idx, sink_name in ((0, "windows_live"), (1, "sliding_live")):
            frames = [p[idx].to_pandas() for p in parts
                      if p[idx] is not None]
            if not frames:
                continue
            allp = pd.concat(frames, ignore_index=True)
            agg = allp.groupby(
                ["clip_id", "window_start", "window_end"], as_index=False,
            )[["n_clips", "sum_dur_ms"]].sum()
            agg["epoch"] = np.int64(epoch)
            tbl = pa.Table.from_pandas(
                agg.sort_values(["clip_id", "window_start"]),
                preserve_index=False)
            staged.append(
                (sink_name,
                 self.sink[sink_name].stage_fragment(tbl, epoch, 0)))
        sess_frames = [p[2].to_pandas() for p in parts
                       if p[2] is not None]
        if sess_frames:
            # post-adoption each key's opens sit on ONE partition: concat
            allp = pd.concat(sess_frames, ignore_index=True)
            allp["epoch"] = np.int64(epoch)
            tbl = pa.Table.from_pandas(
                allp.sort_values(["clip_id", "session_start"]),
                preserve_index=False)
            staged.append(
                ("sessions_live",
                 self.sink["sessions_live"].stage_fragment(tbl, epoch, 0)))
        return staged

    def _append_lineage(self, entry: dict):
        """One immutable object per epoch (no file append — object-store
        compatible); a replay's duplicate write no-ops (conditional PUT,
        equivalent content by deterministic replay)."""
        from ..fs import fput

        from ..fs import resolve as _resolve

        fs_i, p = _resolve(
            os.path.join(self.out_root, "_lineage", self.name,
                         f"e{int(entry['epoch']):06d}.json"))
        fs_i.put(p, json.dumps(entry).encode(), mode="create_or_skip",
                 durable=True)

    def _process_hot(self, results: list, epoch: int, wm: int) -> list:
        """Merge hot-key close partials across salt partitions.

        - tumbling/sliding window partials: group-sum → one merged
          fragment per sink, stamped partition=-1;
        - sessions: gap-merge every extracted interval per key, stage the
          merged-closed ones, and ADOPT the still-open remainder into the
          key's home partition (must precede the epoch checkpoint).
        Returns [(sink_name, FragmentMeta)] to include in the commit.
        """
        import ray

        from ..state.store import _stamp

        cfg = self.cfg
        staged: list = []
        for name, sink_key in (("hot_windows", "windows"), ("hot_sliding", "sliding")):
            tbls = [r["hot"][name] for r in results if name in r.get("hot", {})]
            if not tbls:
                continue
            cat = pa.concat_tables(tbls, promote_options="default")
            has_sample = "sample_h" in cat.column_names
            has_distinct = "distinct_h" in cat.column_names
            has_mode = "mode_hs" in cat.column_names
            has_top = "top_vs" in cat.column_names
            if has_sample or has_distinct or has_mode or has_top:
                # window_sample_k / window_distinct_k / window_mode_k
                # partials: re-union each key's sketch(es) across salt
                # partitions, then emit the same final columns (in the
                # same order) as the cold path — every union is the ONE
                # monoid rule the actors use, so the result is
                # byte-identical to an unsalted run
                from ..state.store import (
                    _bottomk_union,
                    _kmv_estimate,
                    _kmv_union,
                    _mode_of,
                    _modek_union,
                    _sample_quantiles,
                    _topk_union,
                )

                k = cfg.window_sample_k
                dk = cfg.window_distinct_k
                mk = cfg.window_mode_k
                tk = cfg.window_top_k
                df = cat.to_pandas()
                cells: dict = {}
                for r in df.itertuples(index=False):
                    kw = (r.clip_id, int(r.window_start))
                    cur = cells.get(kw)
                    if cur is None:
                        cur = cells[kw] = {
                            "we": int(r.window_end), "n": 0, "s": 0,
                            "hs": np.array([], np.uint64),
                            "vs": np.array([], np.int64),
                            "ch": np.array([], np.uint64),
                            "mh": np.array([], np.uint64),
                            "mc": np.array([], np.int64),
                            "tv": np.array([], np.int64),
                            "th": np.array([], np.uint64),
                        }
                    cur["we"] = max(cur["we"], int(r.window_end))
                    cur["n"] += int(r.n_clips)
                    cur["s"] += int(r.sum_dur_ms)
                    if has_sample:
                        cur["hs"], cur["vs"] = _bottomk_union(
                            cur["hs"], cur["vs"],
                            np.asarray(r.sample_h, dtype=np.uint64),
                            np.asarray(r.sample_v, dtype=np.int64), k)
                    if has_distinct:
                        cur["ch"] = _kmv_union(
                            cur["ch"],
                            np.asarray(r.distinct_h, dtype=np.uint64), dk)
                    if has_mode:
                        cur["mh"], cur["mc"] = _modek_union(
                            cur["mh"], cur["mc"],
                            np.asarray(r.mode_hs, dtype=np.uint64),
                            np.asarray(r.mode_ns, dtype=np.int64), mk)
                    if has_top:
                        cur["tv"], cur["th"] = _topk_union(
                            cur["tv"], cur["th"],
                            np.asarray(r.top_vs, dtype=np.int64),
                            np.asarray(r.top_hs, dtype=np.uint64), tk)
                kws = sorted(cells)
                cols = {
                    "clip_id": pa.array([kw[0] for kw in kws], pa.string()),
                    "window_start": pa.array([kw[1] for kw in kws], pa.int64()),
                    "window_end": pa.array(
                        [cells[kw]["we"] for kw in kws], pa.int64()),
                    "n_clips": pa.array(
                        [cells[kw]["n"] for kw in kws], pa.int64()),
                    "sum_dur_ms": pa.array(
                        [cells[kw]["s"] for kw in kws], pa.int64()),
                }
                if has_sample:
                    qs = [_sample_quantiles(cells[kw]["vs"]) for kw in kws]
                    cols["p50_dur_ms"] = pa.array([q[0] for q in qs], pa.int64())
                    cols["p90_dur_ms"] = pa.array([q[1] for q in qs], pa.int64())
                    cols["sample_n"] = pa.array(
                        [len(cells[kw]["vs"]) for kw in kws], pa.int64())
                if has_distinct:
                    cols["distinct_content"] = pa.array(
                        [_kmv_estimate(cells[kw]["ch"], dk,
                                       n_cap=cells[kw]["n"]) for kw in kws],
                        pa.int64())
                if has_mode:
                    modes = [_mode_of(cells[kw]["mh"], cells[kw]["mc"])
                             for kw in kws]
                    cols["mode_h"] = pa.array(
                        [m[0] for m in modes], pa.uint64())
                    cols["mode_n"] = pa.array(
                        [m[1] for m in modes], pa.int64())
                if has_top:
                    cols["top_durs"] = pa.array(
                        [cells[kw]["tv"].tolist() for kw in kws],
                        pa.list_(pa.int64()))
                    cols["top1_dur_ms"] = pa.array(
                        [int(cells[kw]["tv"][0]) if len(cells[kw]["tv"])
                         else 0 for kw in kws], pa.int64())
                merged = pa.table(cols)
                merged = _stamp(merged, -1, epoch)
                frag = self.sink[sink_key].stage_fragment(merged, epoch, -1)
                staged.append((sink_key, frag))
                m = "windows_closed" if sink_key == "windows" else "sliding_closed"
                self._hot_metrics[m] = self._hot_metrics.get(m, 0) + merged.num_rows
                continue
            gb = cat.group_by(["clip_id", "window_start"], use_threads=False).aggregate(
                [("window_end", "max"), ("n_clips", "sum"), ("sum_dur_ms", "sum")]
            )
            merged = pa.table(
                {
                    "clip_id": gb["clip_id"],
                    "window_start": gb["window_start"],
                    "window_end": gb["window_end_max"],
                    "n_clips": gb["n_clips_sum"],
                    "sum_dur_ms": gb["sum_dur_ms_sum"],
                }
            )
            merged = _stamp(merged, -1, epoch)
            frag = self.sink[sink_key].stage_fragment(merged, epoch, -1)
            staged.append((sink_key, frag))
            m = "windows_closed" if sink_key == "windows" else "sliding_closed"
            self._hot_metrics[m] = self._hot_metrics.get(m, 0) + merged.num_rows
        # sessions: gap-merge all extracted intervals per key
        intervals: list = []
        for r in results:
            intervals.extend(r.get("hot", {}).get("hot_sessions") or [])
        if intervals:
            from ..state.store import _bottomk_union, _session_rows_table

            gap = cfg.session_gap_ms
            ssk = getattr(cfg, "session_sample_k", 0)
            per_key: dict[str, list] = {}
            for k, *rest in intervals:
                per_key.setdefault(k, []).append(list(rest))
            closed_rows, open_by_home = [], {}
            keys_np = np.asarray(sorted(per_key), dtype=object)
            homes = partition_for(keys_np, cfg.num_partitions)
            for k, home in zip(keys_np, homes):
                # explicit scalar sort key: interval tails may carry the
                # numpy sample arrays, which must never be compared
                ivs = sorted(per_key[k], key=lambda s: (s[0], s[1], s[2]))
                merged_ivs = [ivs[0]]
                for s in ivs[1:]:
                    prev = merged_ivs[-1]
                    if s[0] <= prev[1] + gap:
                        prev[1] = max(prev[1], s[1])
                        prev[2] += s[2]
                        prev[3] += s[3]
                        if len(prev) > 5 and len(s) > 5:
                            prev[4], prev[5] = _bottomk_union(
                                prev[4], prev[5], s[4], s[5], ssk)
                        elif len(s) > 5:
                            prev.extend([s[4], s[5]])
                    else:
                        merged_ivs.append(s)
                for s in merged_ivs:
                    if s[1] + gap < wm:
                        closed_rows.append((k, *s))
                    else:
                        open_by_home.setdefault(int(home), {}).setdefault(
                            k, []
                        ).append(s)
            if closed_rows:
                tbl = _session_rows_table(closed_rows, ssk)
                tbl = _stamp(tbl, -1, epoch)
                frag = self.sink["sessions"].stage_fragment(tbl, epoch, -1)
                staged.append(("sessions", frag))
                self._hot_metrics["sessions_closed"] = (
                    self._hot_metrics.get("sessions_closed", 0) + len(closed_rows)
                )
            if open_by_home:
                ray.get(
                    [
                        self.actors[h].adopt_sessions.remote(sess)
                        for h, sess in open_by_home.items()
                    ]
                )
        return staged

    def _update_hot_detection(self, results: list, acks: list):
        """Fold per-epoch key counts into the sticky hot set."""
        cfg = self.cfg
        if not cfg.hot_key_threshold:
            return
        self._total_clips += sum(a["n"] for a in acks if a["source"] == "clips")
        for r in results:
            for k, c in r.get("key_counts", []):
                self._key_counts[k] = self._key_counts.get(k, 0) + int(c)
        if len(self._key_counts) > 4096:
            top = sorted(self._key_counts.items(), key=lambda kv: -kv[1])[:2048]
            self._key_counts = dict(top)
        if self._total_clips:
            floor = cfg.hot_key_threshold * self._total_clips
            for k, c in self._key_counts.items():
                if c >= floor:
                    self._hot.add(k)

    def _gc_checkpoints(self, epoch: int):
        """Delete checkpoint dirs no restore can need: everything before
        the newest FULL snapshot at or below the retention horizon (a
        delta is only restorable with its full base + contiguous chain)."""
        keep = self.cfg.keep_checkpoints
        min_needed = epoch - keep + 1
        dirs = [
            os.path.join(self.part_root, f"p{p:04d}")
            for p in range(self.cfg.num_partitions)
        ] + [
            os.path.join(self.ckpt_root, f"d{s:04d}")
            for s in range(len(self.dedup_shards))
        ] + [
            os.path.join(self.ckpt_root, f"n{s:04d}")
            for s in range(len(self.neardup_shards))
        ]
        for d in dirs:
            if not _fs.fisdir(d):
                continue
            fulls = [
                int(n[1:])
                for n in _fs.flist(d)
                if n.startswith("e")
                and _fs.fexists(os.path.join(d, n, "state.pkl"))
            ]
            base_candidates = [e for e in fulls if e <= min_needed]
            if not base_candidates:
                continue
            base = max(base_candidates)
            for n in _fs.flist(d):
                if n.startswith("e") and int(n[1:]) < base:
                    fs_i, dp = _fs.resolve(os.path.join(d, n))
                    fs_i.delete_tree(dp)


@dataclass
class _StateCfg:
    """Plain-data slice of ReplicateConfig shipped to state actors."""

    join_window_ms: int = 60_000
    allowed_lateness_ms: int = 30_000
    window_size_ms: int = 10_000
    session_gap_ms: int = 0
    sliding_size_ms: int = 0
    sliding_slide_ms: int = 0
    num_partitions: int = 0

    FUNNEL_KINDS = {"clip": 0, "update": 1, "delete": 2}

    def __init__(self, cfg: ReplicateConfig):
        self.join_window_ms = cfg.join_window_ms
        self.allowed_lateness_ms = cfg.allowed_lateness_ms
        self.window_size_ms = cfg.window_size_ms
        self.session_gap_ms = cfg.session_gap_ms
        self.sliding_size_ms = cfg.sliding_size_ms
        self.sliding_slide_ms = cfg.sliding_slide_ms
        self.num_partitions = cfg.num_partitions
        self.funnel_steps = tuple(
            self.FUNNEL_KINDS[s] for s in (cfg.funnel_steps or ())
        )
        self.funnel_within_ms = cfg.funnel_within_ms
        self.changelog = cfg.changelog
        self.window_sample_k = getattr(cfg, "window_sample_k", 0)
        self.window_distinct_k = getattr(cfg, "window_distinct_k", 0)
        self.window_mode_k = getattr(cfg, "window_mode_k", 0)
        self.window_top_k = getattr(cfg, "window_top_k", 0)
        self.session_sample_k = getattr(cfg, "session_sample_k", 0)
        self.temporal_join = getattr(cfg, "temporal_join", False)
        self.early_fire = getattr(cfg, "early_fire", False)
