"""Parity fuzz for the vectorized single-block MD5 (extras/md5vec).

The epoch shuffle / A-Res sampler / stratified sampler key every row by
``int(md5(s).hexdigest()[:15], 16)`` — DuckDB-parity convention. The
vectorized path must match hashlib bit-for-bit on every input shape it
claims (<= 55 bytes single-block) and fall back correctly beyond.
"""

from __future__ import annotations

import hashlib
import random
import string

import numpy as np
import pyarrow as pa

from pyfuseray.extras.md5vec import md5_hi60_arrow, md5_hi60_ints


def _ref(b: bytes) -> int:
    return int(hashlib.md5(b).hexdigest()[:15], 16)


def test_md5vec_fuzz_vs_hashlib():
    rng = random.Random(13)
    alpha = string.ascii_letters + string.digits + ":_-./ "
    vals = [""]
    # every length 0..55 (single block), plus 56..80 (fallback path)
    for ln in list(range(56)) + [56, 57, 63, 64, 70, 80]:
        for _ in range(4):
            vals.append("".join(rng.choice(alpha) for _ in range(ln)))
    arr = pa.array(vals, pa.string())
    got = md5_hi60_arrow(arr)
    want = np.array([_ref(v.encode()) for v in vals], np.int64)
    np.testing.assert_array_equal(got, want)


def test_md5vec_prefix_and_chunked():
    vals = [f"{i}" for i in range(500)]
    chunked = pa.chunked_array([vals[:200], vals[200:]], pa.string())
    got = md5_hi60_arrow(chunked, prefix=b"7:")
    want = np.array([_ref(f"7:{v}".encode()) for v in vals], np.int64)
    np.testing.assert_array_equal(got, want)


def test_md5vec_ints_matches_str_rendering():
    ids = list(range(0, 3000, 7)) + [10**17, 2**62]
    got = md5_hi60_ints(ids)
    want = np.array([_ref(str(i).encode()) for i in ids], np.int64)
    np.testing.assert_array_equal(got, want)
    got_p = md5_hi60_ints(pa.chunked_array([ids]), prefix="42:")
    want_p = np.array([_ref(f"42:{i}".encode()) for i in ids], np.int64)
    np.testing.assert_array_equal(got_p, want_p)


def test_key_stage_wrappers_match_hashlib():
    """The three consumers (epoch shuffle, A-Res sampler) keep their
    documented key definitions after the vectorization."""
    from pyfuseray.extras.sampling import _md5_u
    from pyfuseray.extras.shuffle import _epoch_keys

    ids = [0, 1, 5, 999, 123456789, 10**12]
    np.testing.assert_array_equal(
        _epoch_keys(ids, 3),
        np.array([_ref(f"3:{i}".encode()) for i in ids], np.int64),
    )
    u = _md5_u(ids)
    want_u = (np.array([_ref(str(i).encode()) for i in ids], np.int64) + 0.5) / float(
        1 << 60
    )
    np.testing.assert_allclose(u, want_u, rtol=0, atol=0)


def test_md5vec_sliced_array_offset():
    """Array slices carry a nonzero arrow offset — buffer math must
    honor it."""
    vals = [f"doc-{i}" for i in range(100)]
    arr = pa.array(vals, pa.string()).slice(17, 50)
    got = md5_hi60_arrow(arr)
    want = np.array([_ref(v.encode()) for v in vals[17:67]], np.int64)
    np.testing.assert_array_equal(got, want)
