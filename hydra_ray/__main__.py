"""`ray job submit` / CLI entrypoint.

The north rule runs the engine "via ray job submit on a fixed-size
multi-node Ray cluster"; this module is that job script:

    ray job submit --working-dir . -- \
        python -m hydra_ray replicate --clips /data/clips --out /data/out \
            --updates /data/updates --partitions 64

Inside a submitted job `ray.init()` attaches to the cluster
automatically; standalone runs fall back to a local session.  Only this
entrypoint owns the Ray session — the library never calls ray.init
(driver contract, CLAUDE.md).

Subcommands:
  replicate   run the streaming replication pipeline over lancelite
              source tables (resumes from the last committed epoch)
  synth       synthesize a clip/update source pair for smoke runs
  query       run one catalog query by name over an sf directory
"""

from __future__ import annotations

import argparse
import json
import sys


def _ray_init():
    import ray

    if not ray.is_initialized():
        ray.init(address="auto" if "--address-auto" in sys.argv else "local",
                 include_dashboard=False, logging_level="ERROR")
    return ray


def _cmd_replicate(args) -> int:
    ray = _ray_init()
    from .pipelines.replicate import ReplicateConfig, ReplicatePipeline

    cfg = ReplicateConfig(
        num_partitions=args.partitions,
        join_window_ms=args.join_window_ms,
        allowed_lateness_ms=args.lateness_ms,
        window_size_ms=args.window_ms,
        session_gap_ms=args.session_gap_ms,
        sliding_size_ms=args.sliding_ms,
        sliding_slide_ms=args.sliding_slide_ms or args.window_ms,
        dedup=args.dedup,
        neardup=args.neardup,
        audio_features=args.audio_features,
        changelog=args.changelog,
        funnel_steps=tuple(args.funnel.split(",")) if args.funnel else (),
        funnel_within_ms=args.funnel_within_ms,
        max_versions_per_epoch=args.versions_per_epoch,
        compact_sinks_every=args.compact_every,
        keep_history_versions=args.keep_history,
        window_sample_k=args.window_sample_k,
        window_distinct_k=args.window_distinct_k,
        window_mode_k=args.window_mode_k,
        window_top_k=args.window_top_k,
        session_sample_k=args.session_sample_k,
        temporal_join=args.temporal_join,
    )
    pipe = ReplicatePipeline(args.clips, args.out, cfg, args.updates)
    metrics = pipe.run(max_epochs=args.max_epochs)
    print(json.dumps({"metrics": metrics}, default=int))
    ray.shutdown()
    return 0


def _cmd_synth(args) -> int:
    _ray_init()
    from .synth import synth_clips_table, synth_updates_table
    from .table import Table

    clips = synth_clips_table(args.n_clips)
    ct = Table.create(f"{args.root}/clips", schema=clips.schema)
    step = max(1, args.n_clips // args.versions)
    for v in range(args.versions):
        part = clips.slice(v * step, step)
        if part.num_rows:
            ct.append(part)
    upd = synth_updates_table(args.n_clips)
    ut = Table.create(f"{args.root}/updates", schema=upd.schema)
    ustep = -(-upd.num_rows // args.versions)
    for v in range(args.versions):
        part = upd.slice(v * ustep, min(ustep, upd.num_rows - v * ustep))
        if part.num_rows:
            ut.append(part)
    print(json.dumps({"clips": clips.num_rows, "updates": upd.num_rows,
                      "root": args.root}))
    return 0


def _cmd_query(args) -> int:
    ray = _ray_init()
    import __ray_entry__ as entrymod

    res = entrymod.queries()[args.name](args.sf_dir)
    import ray.data

    if isinstance(res, ray.data.Dataset):
        res = res.to_pandas()
    if hasattr(res, "to_pandas"):
        res = res.to_pandas()
    print(res.head(args.head).to_string())
    print(json.dumps({"rows": len(res)}))
    ray.shutdown()
    return 0


def _cmd_rescale(args) -> int:
    ray = _ray_init()
    from .pipelines.replicate import ReplicateConfig
    from .state.rescale import rescale_state

    cfg = ReplicateConfig(
        join_window_ms=args.join_window_ms,
        allowed_lateness_ms=args.lateness_ms,
        window_size_ms=args.window_ms,
        session_gap_ms=args.session_gap_ms,
        sliding_size_ms=args.sliding_ms,
        sliding_slide_ms=args.sliding_slide_ms or args.window_ms,
    )
    info = rescale_state(args.out, args.new_partitions, cfg, name=args.name)
    print(json.dumps(info))
    ray.shutdown()
    return 0


def _cmd_state(args) -> int:
    # read-only: restores checkpoint chains on the driver, no Ray needed
    from .pipelines.replicate import ReplicateConfig
    from .state.query import latest_epoch, read_state

    cfg = ReplicateConfig(
        join_window_ms=args.join_window_ms,
        allowed_lateness_ms=args.lateness_ms,
        window_size_ms=args.window_ms,
        session_gap_ms=args.session_gap_ms,
        sliding_size_ms=args.sliding_ms,
        sliding_slide_ms=args.sliding_slide_ms or args.window_ms,
    )
    root = f"{args.out}/_checkpoints"
    # a rescale moves partition dirs under a committed layout generation
    layout = ""
    try:
        from .table import Table

        layout = str(
            Table(f"{args.out}/replicated")
            .pipeline_state("replicate").get("ckpt_layout", "") or "")
    except FileNotFoundError:
        pass
    epoch = (args.epoch if args.epoch is not None
             else latest_epoch(root, layout))
    state = read_state(root, cfg, epoch=epoch, layout=layout)
    summary = {
        "epoch": epoch,
        "open_windows": state["windows"].num_rows,
        "open_sliding": state["sliding"].num_rows,
        "open_sessions": state["sessions"].num_rows,
        "view_keys": state["view"].num_rows,
        "buffers": state["buffers"].to_pylist(),
    }
    for tier in ("dedup", "neardup"):
        if tier in state:
            summary[f"{tier}_entries"] = int(
                sum(state[tier]["entries"].to_pylist()))
    if args.table:
        if args.table in ("windows_live", "sliding_live",
                          "sessions_live"):
            # the early-fire ONLINE tier: committed provisional+final
            # overlay straight from the sink tables (no checkpoint read)
            from .pipelines.replicate import (
                read_sessions_live,
                read_windows_live,
            )

            if args.table == "sessions_live":
                view = read_sessions_live(args.out)
            else:
                view = read_windows_live(args.out,
                                         kind=args.table.split("_")[0])
            print(view.head(args.head).to_string())
            print(json.dumps(summary))
            return 0
        if args.table not in state:
            # dedup/neardup tiers exist only when the checkpoint tree has
            # that index (ADVICE r3: don't KeyError on a bare tree)
            print(f"no such state table {args.table!r}; "
                  f"available: {sorted(state)}")
            print(json.dumps(summary))
            return 1
        print(state[args.table].to_pandas().head(args.head).to_string())
    print(json.dumps(summary))
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="hydra_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    r = sub.add_parser("replicate")
    r.add_argument("--clips", required=True)
    r.add_argument("--out", required=True)
    r.add_argument("--updates")
    r.add_argument("--partitions", type=int, default=8)
    r.add_argument("--join-window-ms", type=int, default=60_000)
    r.add_argument("--lateness-ms", type=int, default=30_000)
    r.add_argument("--window-ms", type=int, default=10_000)
    r.add_argument("--session-gap-ms", type=int, default=0)
    r.add_argument("--sliding-ms", type=int, default=0)
    r.add_argument("--sliding-slide-ms", type=int, default=0)
    r.add_argument("--dedup", action="store_true")
    r.add_argument("--audio-features", action="store_true",
                   help="carry per-clip features on the payload fragments")
    r.add_argument("--neardup", action="store_true")
    r.add_argument("--changelog", action="store_true")
    r.add_argument("--funnel", help="comma list: clip,update,delete")
    r.add_argument("--funnel-within-ms", type=int, default=0)
    r.add_argument("--versions-per-epoch", type=int, default=1)
    r.add_argument("--compact-every", type=int, default=0)
    r.add_argument("--keep-history", type=int, default=0,
                   help="bound each sink's manifest log to the newest K "
                        "versions (0 = keep all)")
    r.add_argument("--window-sample-k", type=int, default=0)
    r.add_argument("--window-distinct-k", type=int, default=0)
    r.add_argument("--window-mode-k", type=int, default=0)
    r.add_argument("--window-top-k", type=int, default=0)
    r.add_argument("--session-sample-k", type=int, default=0)
    r.add_argument("--temporal-join", action="store_true")
    r.add_argument("--max-epochs", type=int)
    r.add_argument("--address-auto", action="store_true",
                   help="attach to the submitting cluster (ray job submit)")
    r.set_defaults(fn=_cmd_replicate)

    s = sub.add_parser("synth")
    s.add_argument("--root", required=True)
    s.add_argument("--n-clips", type=int, default=2000)
    s.add_argument("--versions", type=int, default=4)
    s.set_defaults(fn=_cmd_synth)

    rs = sub.add_parser("rescale")
    rs.add_argument("--out", required=True,
                    help="pipeline output root (holds _checkpoints)")
    rs.add_argument("--new-partitions", type=int, required=True)
    rs.add_argument("--name", default="replicate")
    rs.add_argument("--join-window-ms", type=int, default=60_000)
    rs.add_argument("--lateness-ms", type=int, default=30_000)
    rs.add_argument("--window-ms", type=int, default=10_000)
    rs.add_argument("--session-gap-ms", type=int, default=0)
    rs.add_argument("--sliding-ms", type=int, default=0)
    rs.add_argument("--sliding-slide-ms", type=int, default=0)
    rs.add_argument("--address-auto", action="store_true")
    rs.set_defaults(fn=_cmd_rescale)

    st = sub.add_parser("state",
                        help="inspect committed checkpoint state "
                             "(read-only, no Ray session)")
    st.add_argument("--out", required=True,
                    help="pipeline output root (holds _checkpoints)")
    st.add_argument("--epoch", type=int)
    st.add_argument("--table",
                    choices=["windows", "sliding", "sessions", "view",
                             "buffers", "dedup", "neardup",
                             "windows_live", "sliding_live",
                             "sessions_live"])
    st.add_argument("--head", type=int, default=20)
    st.add_argument("--join-window-ms", type=int, default=60_000)
    st.add_argument("--lateness-ms", type=int, default=30_000)
    st.add_argument("--window-ms", type=int, default=10_000)
    st.add_argument("--session-gap-ms", type=int, default=0)
    st.add_argument("--sliding-ms", type=int, default=0)
    st.add_argument("--sliding-slide-ms", type=int, default=0)
    st.set_defaults(fn=_cmd_state)

    q = sub.add_parser("query")
    q.add_argument("name")
    q.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    q.add_argument("--head", type=int, default=10)
    q.add_argument("--address-auto", action="store_true")
    q.set_defaults(fn=_cmd_query)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
