"""Similarity operator tests."""

import pytest

from traildb_spark.operators import similarity


def test_kcenter_select_hand_computed(spark):
    """Four points on a line: start at min id (0.0), then farthest-first
    traversal picks the extremes before the middle; ties to min id."""
    rows = [
        (1, [0.0, 0.0]), (2, [1.0, 0.0]), (3, [10.0, 0.0]),
        (4, [4.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = [(r.rank, r.vec_id) for r in
           similarity.kcenter_select(df, 4).orderBy("rank").collect()]
    # from 1: farthest is 3 (d=10); then 4 (min(4,6)=4 beats 2's 1);
    # then 2
    assert got == [(1, 1), (2, 3), (3, 4), (4, 2)]
    s = 1 << 20
    out = {r.rank: r.maximin_dist2 for r in
           similarity.kcenter_select(df, 4).collect()}
    assert out[2] == (10 * s) ** 2
    assert out[3] == (4 * s) ** 2
    # k larger than the corpus stops early
    assert similarity.kcenter_select(df, 10, max_k=16).count() == 4
    import pytest as _pytest
    with _pytest.raises(ValueError):
        similarity.kcenter_select(df, 0)
    with _pytest.raises(ValueError):
        similarity.kcenter_select(df, 65)
