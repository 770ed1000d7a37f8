"""HyperLogLog guarantees: error bound vs exact distinct counts across
scales, merge associativity (batch-structure independence), and the
linear-counting small-range regime."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from pyfuseray.extras.hll import (
    _estimate,
    _registers_from_values,
    approx_distinct,
)


def test_register_fold_is_batch_structure_independent():
    vals = [f"v{i}" for i in range(5000)]
    one = _registers_from_values(pa.array(vals), 12)
    # two halves + duplicates, folded by elementwise max
    a = _registers_from_values(pa.array(vals[:3000]), 12)
    b = _registers_from_values(pa.array(vals[2000:]), 12)
    np.testing.assert_array_equal(one, np.maximum(a, b))


def test_estimate_error_bound_across_scales():
    # std error ~1.04/sqrt(4096) = 1.6%; assert a generous 5% envelope
    for n in (500, 5000, 60000):
        regs = _registers_from_values(
            pa.array([f"item-{i}" for i in range(n)]), 12
        )
        est = _estimate(regs)
        assert abs(est - n) / n < 0.05, (n, est)


def test_small_range_linear_counting_is_tight():
    regs = _registers_from_values(pa.array([f"x{i}" for i in range(30)]), 12)
    assert abs(_estimate(regs) - 30) <= 2


def test_approx_distinct_dataset(ray_session):
    n = 20000
    df = pd.DataFrame(
        {
            # distinct ids, duplicated 3x and shuffled across partitions
            "k": [f"key-{i % n}" for i in range(3 * n)],
            "text": [
                f"tok{i % 97} tok{i % 101} shared common" for i in range(3 * n)
            ],
        }
    )
    ds = rd.from_pandas(df).repartition(13)
    est = approx_distinct(ds, "k")
    assert abs(est - n) / n < 0.05, est
    # tokenized mode: tok0..tok100 (the %97 set is a subset of the
    # %101 set) + {shared, common} = 103 distinct tokens; linear
    # counting makes this near-exact
    vocab = approx_distinct(ds, "text", tokenize=True)
    assert abs(vocab - 103) <= 3, vocab
