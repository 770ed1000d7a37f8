"""Zero-copy embedding-column decode shared by every vector stage.

An arrow ``list<float>`` / ``fixed_size_list<float>`` column of
fixed-width vectors is ONE contiguous values buffer plus offsets; the
hot-loop conversion to a (n, dim) numpy matrix is a flatten + reshape —
no per-row Python lists (``to_pylist`` built n Python lists per batch
in every scoring/assign/project stage, round-2 verdict #3). Falls back
to the slow path only for ragged or null-bearing columns.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def as_matrix(col, dtype=np.float64) -> np.ndarray:
    """(n, dim) matrix from an arrow list-of-float column (ChunkedArray
    or Array). Zero-copy from the values buffer when the lists are
    regular (fixed dim, no nulls) except for the dtype cast; exact
    fallback otherwise."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    n = len(arr)
    if n == 0:
        return np.empty((0, 0), dtype=dtype)
    if arr.null_count == 0 and (
        pa.types.is_fixed_size_list(arr.type)
        or pa.types.is_list(arr.type)
        or pa.types.is_large_list(arr.type)
    ):
        # flatten() respects slices/offsets and returns only this
        # array's values
        flat = arr.flatten()
        if flat.null_count == 0 and flat.type.num_fields == 0:
            vals = flat.to_numpy(zero_copy_only=False)
            if vals.size % n == 0:
                dim = vals.size // n
                if pa.types.is_fixed_size_list(arr.type):
                    return vals.reshape(n, dim).astype(dtype, copy=False)
                offs = arr.offsets.to_numpy(zero_copy_only=False)
                if np.all(np.diff(offs) == dim):
                    return vals.reshape(n, dim).astype(dtype, copy=False)
    return np.asarray(arr.to_pylist(), dtype=dtype)


def series_matrix(series, dtype=np.float64) -> np.ndarray:
    """(n, dim) matrix from a pandas Series whose elements are vectors
    (numpy arrays / lists, as produced by arrow->pandas conversion)."""
    vals = series.to_numpy()
    if vals.size == 0:
        return np.empty((0, 0), dtype=dtype)
    return np.stack([np.asarray(v, dtype=dtype) for v in vals])
