"""ORC interchange edge (`sources/orc.py`): Arrow-native round trip."""

import shutil
import uuid

import numpy as np
import pyarrow as pa
import pytest

from hydra_ray.sources.orc import read_orc, write_orc


def test_roundtrip_and_column_pruning(ray_session):
    import ray.data as rd

    n = 5_000
    t = pa.table({
        "k": pa.array(np.arange(n, dtype=np.int64)),
        "v": pa.array(np.linspace(0, 1, n)),
        "s": pa.array([f"row-{i}" for i in range(n)]),
    })
    ds = rd.from_arrow(t).repartition(4)
    out = f"/tmp/hydra_orc_test/{uuid.uuid4().hex}"
    try:
        rows = write_orc(ds, out)
        assert rows == n
        back = read_orc(out).to_pandas().sort_values("k").reset_index(drop=True)
        ref = t.to_pandas()
        assert (back == ref).all().all()
        pruned = read_orc(out, columns=["k", "s"]).to_pandas()
        assert sorted(pruned.columns) == ["k", "s"]
        assert len(pruned) == n
    finally:
        shutil.rmtree(out, ignore_errors=True)


def test_read_orc_empty_dir_raises(tmp_path):
    with pytest.raises(ValueError, match="no .orc files"):
        read_orc(str(tmp_path))
