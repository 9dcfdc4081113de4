"""Regenerate the stored-reference golden feature tables that oracle
``audio_fbank`` / ``audio_mfcc`` (VERDICT r4 #7).

The queries synthesize their own corpus (sf-independent) and the
decode→resample→fbank/mfcc kernels are bitwise deterministic across cpu
counts and batch splits, so one stored run pins every coefficient as an
identity-SQL oracle.  Re-run ONLY after an intentional kernel change —
the parity suite and the driver gate both diff against these files.

    python tools/make_audio_golden.py
"""

import os
import sys

import pyarrow.parquet as pq

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GOLDEN = os.path.join(ROOT, "hydra_ray", "golden")


def main():
    sys.path.insert(0, ROOT)
    import ray
    from ray.data import DataContext

    ray.init(address="local", num_cpus=8, include_dashboard=False,
             logging_level="ERROR")
    DataContext.get_current().enable_progress_bars = False
    from hydra_ray.pipelines import batch_queries as q

    os.makedirs(GOLDEN, exist_ok=True)
    for name, fn in (("audio_fbank", q.q_audio_fbank),
                     ("audio_mfcc", q.q_audio_mfcc)):
        tb = fn("/root/testdata/sf0.001").to_arrow_refs()
        tables = [t for t in ray.get(tb) if t.num_rows]
        import pyarrow as pa

        out = pa.concat_tables(tables).sort_by(
            [("seq", "ascending"), (out_idx(name), "ascending")])
        path = os.path.join(GOLDEN, f"{name}.parquet")
        pq.write_table(out, path, compression="zstd")
        print(f"wrote {path}: {out.num_rows} rows, "
              f"{os.path.getsize(path)} bytes")
    ray.shutdown()


def out_idx(name):
    return "mel" if name == "audio_fbank" else "coef"


if __name__ == "__main__":
    main()
