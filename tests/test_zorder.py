"""Z-order clustered sink: multi-column pruning (`sinks.zorder_write`)."""

import shutil
import uuid

import numpy as np
import pyarrow as pa
import pytest

from hydra_ray.sinks import read_clustered, write_partitioned, zorder_write


def _two_col_ds(n=40_000, seed=3):
    import ray.data as rd

    rng = np.random.default_rng(seed)
    t = pa.table({
        "row_id": pa.array(np.arange(n, dtype=np.int64)),
        "x": pa.array(rng.integers(0, 1_000_000, n, dtype=np.int64)),
        "y": pa.array(rng.integers(0, 1_000_000, n, dtype=np.int64)),
    })
    return rd.from_arrow(t).repartition(8), t


def test_zorder_prunes_box_queries_hash_layout_cannot(ray_session):
    ds, t = _two_col_ds()
    zroot = f"/tmp/hydra_z/{uuid.uuid4().hex}"
    hroot = f"/tmp/hydra_z/{uuid.uuid4().hex}"
    try:
        zc = zorder_write(ds, ["x", "y"], zroot, num_partitions=64)
        assert sum(zc.values()) == t.num_rows
        write_partitioned(ds, hroot, key_col="row_id", num_partitions=64)

        box = {"x": (100_000, 160_000), "y": (800_000, 860_000)}
        zds, z_files = read_clustered(zroot, box)
        hds, h_files = read_clustered(hroot, box)

        x = t["x"].to_numpy()
        y = t["y"].to_numpy()
        m = ((x >= 100_000) & (x <= 160_000)
             & (y >= 800_000) & (y <= 860_000))
        expect = set(t["row_id"].to_numpy()[m])
        got_z = set(zds.to_pandas()["row_id"])
        got_h = set(hds.to_pandas()["row_id"])
        assert got_z == expect == got_h  # pruning never changes results

        # the point of the layout: the box touches a small corner of the
        # curve, while the hash layout spreads it over every file
        assert h_files >= 56, h_files
        assert z_files <= h_files // 4, (z_files, h_files)
    finally:
        shutil.rmtree(zroot, ignore_errors=True)
        shutil.rmtree(hroot, ignore_errors=True)


def test_single_column_predicates_also_prune(ray_session):
    ds, t = _two_col_ds(20_000, seed=5)
    root = f"/tmp/hydra_z/{uuid.uuid4().hex}"
    try:
        zorder_write(ds, ["x", "y"], root, num_partitions=64)
        one, n_files = read_clustered(root, {"x": (0, 50_000)})
        x = t["x"].to_numpy()
        assert set(one.to_pandas()["row_id"]) == set(
            t["row_id"].to_numpy()[x <= 50_000])
        assert n_files < 64  # a 5% slice of ONE dimension still prunes
    finally:
        shutil.rmtree(root, ignore_errors=True)


def test_zorder_guards(ray_session):
    ds, _ = _two_col_ds(100)
    with pytest.raises(ValueError, match=">= 2 cluster"):
        zorder_write(ds, ["x"], "/tmp/never")
    with pytest.raises(ValueError, match="power of two"):
        zorder_write(ds, ["x", "y"], "/tmp/never", num_partitions=48)
