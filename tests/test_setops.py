"""EXCEPT / INTERSECT (distinct semantics) vs pandas set references,
including SQL NULL-equality in set ops and bag→set collapse."""

import numpy as np
import pandas as pd
import ray.data as rd

from hydra_ray.stages.setops import except_distinct, intersect_distinct


def _sets(df):
    return {tuple(r) for r in df.itertuples(index=False)}


def test_setops_match_reference_with_nulls_and_dupes(ray_session):
    a = pd.DataFrame({
        "k": ["x", "x", "y", "z", None, None, "w"],
        "v": [1, 1, 2, 3, 4, 4, None],
    })
    b = pd.DataFrame({
        "k": ["x", "z", None, "q"],
        "v": [1, 99, 4, 5],
    })
    da, db = rd.from_pandas(a).repartition(3), rd.from_pandas(b).repartition(2)
    ex = except_distinct(da, db, ["k", "v"], num_buckets=4).to_pandas()
    it = intersect_distinct(da, db, ["k", "v"], num_buckets=4).to_pandas()

    # distinct tuples (NaN counts as equal, as in SQL set ops)
    sa = _sets(a.drop_duplicates())
    sb = _sets(b.drop_duplicates())

    def norm(s):
        return {tuple(None if x != x else x for x in t) for t in s}

    assert norm(_sets(ex)) == norm(sa) - norm(sb)
    assert norm(_sets(it)) == norm(sa) & norm(sb)
    # duplicates collapsed: output rows are unique
    assert len(ex) == len(ex.drop_duplicates())
    assert len(it) == len(it.drop_duplicates())


def test_setops_partition_invariance(ray_session):
    rng = np.random.default_rng(3)
    a = pd.DataFrame({"k": rng.integers(0, 50, 500), "g": rng.integers(0, 4, 500)})
    b = pd.DataFrame({"k": rng.integers(25, 75, 400), "g": rng.integers(0, 4, 400)})
    ref_ex = ref_it = None
    for blocks in (1, 8):
        da, db = rd.from_pandas(a).repartition(blocks), rd.from_pandas(b).repartition(blocks)
        ex = _sets(except_distinct(da, db, ["k", "g"]).to_pandas())
        it = _sets(intersect_distinct(da, db, ["k", "g"]).to_pandas())
        if ref_ex is None:
            ref_ex, ref_it = ex, it
        assert ex == ref_ex and it == ref_it
    sa, sb = _sets(a.drop_duplicates()), _sets(b.drop_duplicates())
    assert ref_ex == sa - sb and ref_it == sa & sb
