"""Vectorized single-block MD5 over numpy — the deterministic-key hot path.

The epoch shuffle, the A-Res weighted sampler and the stratified sampler
all key every row by the top 60 bits of ``md5(<short decimal string>)``
(DuckDB-parity convention, see CLAUDE.md: never builtin ``hash``). Those
inputs are tiny — ``f"{seed}:{doc_id}"`` is at most ~40 bytes — so every
message fits ONE padded MD5 block, and the whole batch can run through
the 64-round compression function as numpy uint32 array arithmetic:
64 rounds x ~8 vector ops instead of one ``hashlib.md5`` object, one
hex-string slice and one ``int(hex, 16)`` parse PER ROW (the last
per-row Python the round-3 verdict found in a streaming stage).

Parity: ``md5_hi60(...)`` == ``int(hashlib.md5(s).hexdigest()[:15], 16)``
== DuckDB ``('0x' || substr(md5(s), 1, 15))::UBIGINT`` for every input;
``tests/test_md5vec.py`` fuzzes it against hashlib. Inputs of 56+ bytes
(two-block messages) take a hashlib fallback per row — they cannot occur
for decimal ids but keep the function total.
"""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# RFC 1321 constants: K[i] = floor(abs(sin(i+1)) * 2^32), per-round shifts
_K = np.array(
    [int(abs(math.sin(i + 1)) * (1 << 32)) & 0xFFFFFFFF for i in range(64)],
    dtype=np.uint32,
)
_S = np.array(
    [7, 12, 17, 22] * 4 + [5, 9, 14, 20] * 4 + [4, 11, 16, 23] * 4
    + [6, 10, 15, 21] * 4,
    dtype=np.uint32,
)
_G = np.array(
    [i for i in range(16)]
    + [(5 * i + 1) % 16 for i in range(16, 32)]
    + [(3 * i + 5) % 16 for i in range(32, 48)]
    + [(7 * i) % 16 for i in range(48, 64)],
    dtype=np.int64,
)


def _compress(M: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """One MD5 compression over n single-block messages.

    ``M``: (n, 16) uint32 little-endian message words. Returns the final
    (A, B) state words — the first 8 digest bytes are their little-endian
    concatenation, which is all the 60-bit key needs.
    """
    n = M.shape[0]
    A = np.full(n, 0x67452301, np.uint32)
    B = np.full(n, 0xEFCDAB89, np.uint32)
    C = np.full(n, 0x98BADCFE, np.uint32)
    D = np.full(n, 0x10325476, np.uint32)
    for i in range(64):
        if i < 16:
            F = (B & C) | (~B & D)
        elif i < 32:
            F = (D & B) | (~D & C)
        elif i < 48:
            F = B ^ C ^ D
        else:
            F = C ^ (B | ~D)
        F = F + A + _K[i] + M[:, _G[i]]  # uint32 arrays wrap mod 2^32
        A, D, C = D, C, B
        s = int(_S[i])
        B = B + ((F << np.uint32(s)) | (F >> np.uint32(32 - s)))
    return A + np.uint32(0x67452301), B + np.uint32(0xEFCDAB89)


def _hi60_from_ab(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """First 15 hex digits of the digest as an int64 (always >= 0).

    digest[:8] is little-endian(A) + little-endian(B); the hex prefix
    reads those 8 bytes big-endian, then drops the low nibble."""
    hi = (a.byteswap().astype(np.uint64) << np.uint64(32)) | b.byteswap().astype(
        np.uint64
    )
    return (hi >> np.uint64(4)).astype(np.int64)


def _pad_blocks(data: np.ndarray, off: np.ndarray, prefix: bytes) -> np.ndarray:
    """(n, 64) uint8 padded single blocks: prefix + per-row bytes."""
    n = off.size - 1
    p = len(prefix)
    lens = np.diff(off)
    M8 = np.zeros((n, 64), np.uint8)
    if p:
        M8[:, :p] = np.frombuffer(prefix, np.uint8)
    total = int(off[-1] - off[0])
    # variable-length scatter: row i's bytes land at [i*64+p, i*64+p+len_i)
    flat = np.repeat(np.arange(n, dtype=np.int64) * 64 + p, lens) + (
        np.arange(total, dtype=np.int64) - np.repeat(off[:-1] - off[0], lens)
    )
    M8.reshape(-1)[flat] = data[off[0] : off[-1]]
    full = lens + p
    M8[np.arange(n), full] = 0x80
    M8[:, 56:64] = (full.astype("<u8") * 8).view(np.uint8).reshape(n, 8)
    return M8


def md5_hi60_arrow(arr: pa.Array | pa.ChunkedArray, *, prefix: bytes = b"") -> np.ndarray:
    """Top-60-bit md5 keys of ``prefix + row`` for a string/binary array.

    Vectorized when every padded message fits one block (prefix + value
    <= 55 bytes); longer rows fall back to hashlib individually."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if pa.types.is_string(arr.type) or pa.types.is_large_string(arr.type):
        arr = arr.cast(pa.binary())
    elif not pa.types.is_binary(arr.type):
        arr = arr.cast(pa.string()).cast(pa.binary())
    n = len(arr)
    if n == 0:
        return np.empty(0, np.int64)
    bufs = arr.buffers()
    off = np.frombuffer(bufs[1], np.int32)[arr.offset : arr.offset + n + 1].astype(
        np.int64
    )
    data = np.frombuffer(bufs[2], np.uint8) if bufs[2] is not None else np.empty(0, np.uint8)
    lens = np.diff(off)
    if int(lens.max(initial=0)) + len(prefix) > 55:
        # two-block rows: exact hashlib per row (cannot happen for ids)
        out = np.empty(n, np.int64)
        vals = arr.to_pylist()
        for i, v in enumerate(vals):
            out[i] = int(
                hashlib.md5(prefix + (v or b"")).hexdigest()[:15], 16
            )
        return out
    # chunk the compression: the 64-round loop touches ~8 temps per
    # round, and past ~64k rows they spill L2 and throughput drops ~3x
    # (measured 2.0 -> 0.65 M rows/s at 1M rows unchunked)
    out = np.empty(n, np.int64)
    step = 65536
    for lo in range(0, n, step):
        hi = min(lo + step, n)
        a, b = _compress(
            _pad_blocks(data, off[lo : hi + 1], prefix).view("<u4")
        )
        out[lo:hi] = _hi60_from_ab(a, b)
    return out


def md5_hi60_ints(ids, *, prefix: str = "") -> np.ndarray:
    """Top-60-bit md5 keys of ``f"{prefix}{id}"`` for an int sequence.

    The decimal rendering rides pyarrow's vectorized int->string cast;
    no Python string is ever materialized."""
    if not isinstance(ids, (pa.Array, pa.ChunkedArray)):
        ids = pa.array(np.asarray(ids, dtype=np.int64), pa.int64())
    return md5_hi60_arrow(pc.cast(ids, pa.string()), prefix=prefix.encode())
