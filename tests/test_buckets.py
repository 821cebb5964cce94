"""Length-bucketing tests (data/buckets.py)."""

import numpy as np

from lda_thesis_tpu.data.buckets import bucket_encode, plan_buckets


def test_plan_buckets_covers_and_reduces_area():
    rng = np.random.default_rng(0)
    lengths = rng.integers(1, 129, size=500).tolist()
    bounds = plan_buckets(lengths, n_buckets=4)
    assert bounds == sorted(bounds)
    assert bounds[-1] >= max(lengths)
    assert all(b % 8 == 0 for b in bounds)
    # padded area must beat single-bucket padding
    area = 0
    for l in lengths:
        area += next(b for b in bounds if l <= b)
    single = len(lengths) * bounds[-1]
    assert area < 0.75 * single


def test_plan_buckets_degenerate():
    assert plan_buckets([], 4) == [8]
    assert plan_buckets([3, 3, 3], 4) == [8]
    b = plan_buckets([5], 3)
    assert b[-1] >= 5


def test_bucket_encode_roundtrip():
    bows = [
        [(0, 2), (3, 1)],
        [(1, 1)] * 1,
        [(2, 4), (4, 1), (5, 2), (6, 1), (7, 3)],
        [(0, 1), (1, 1), (2, 1)],
        [],
    ]
    bd = bucket_encode(bows, n_buckets=3)
    assert bd.n_docs == len(bows)
    # every (id, freq) pair lands in exactly one row slot
    seen = {}
    for tv, tf, ix in zip(bd.tok_v, bd.tok_f, bd.doc_idx):
        for r, d in enumerate(ix):
            pairs = [(int(v), int(f)) for v, f in zip(tv[r], tf[r]) if f > 0]
            seen[int(d)] = pairs
    for d, bow in enumerate(bows):
        assert seen[d] == list(bow)


def test_scatter_rows_restores_order():
    bows = [[(i, 1)] * (i + 1) for i in range(10)]
    bd = bucket_encode(bows, n_buckets=3)
    rows = [np.full((len(ix), 2), -1.0) for ix in bd.doc_idx]
    for g, ix in enumerate(bd.doc_idx):
        for r, d in enumerate(ix):
            rows[g][r] = d
    out = bd.scatter_rows(rows)
    np.testing.assert_array_equal(out[:, 0], np.arange(10))
