"""Vectorized LEB128 varint codec over numpy arrays.

Used for docid deltas and position deltas in the posting format
(SURVEY.md §7.2.3; north star: "docID delta + varint/bitpacked
compression"). Pure numpy — no Python loop over values.
"""

from __future__ import annotations

import numpy as np


def varint_lengths(values: np.ndarray) -> np.ndarray:
    """Encoded byte length of each value (vectorized)."""
    v = np.asarray(values, dtype=np.uint64)
    tmp = v.copy()
    nbytes = np.ones(v.shape, dtype=np.int64)
    for _ in range(9):
        tmp >>= np.uint64(7)
        nbytes += (tmp > 0).astype(np.int64)
    return nbytes


def encode_varints(values: np.ndarray) -> bytes:
    """LEB128-encode a uint64 array; vectorized (no per-value Python loop)."""
    v = np.asarray(values, dtype=np.uint64)
    if v.size == 0:
        return b""
    # bytes needed per value: ceil(bitlength/7), min 1
    nbits = np.zeros(v.shape, dtype=np.int64)
    nz = v > 0
    # bit_length via log2 is unsafe at 2^53; use frexp on float won't cover u64.
    # Compute by repeated shifting over the 10 possible 7-bit groups.
    tmp = v.copy()
    nbytes = np.ones(v.shape, dtype=np.int64)
    for _ in range(9):
        tmp >>= np.uint64(7)
        nbytes += (tmp > 0).astype(np.int64)
    del nbits, nz
    total = int(nbytes.sum())
    out = np.empty(total, dtype=np.uint8)
    # offsets of each value's first byte
    ends = np.cumsum(nbytes)
    starts = ends - nbytes
    # For each byte slot j (0..9) write group j of values with nbytes > j.
    for j in range(10):
        mask = nbytes > j
        if not mask.any():
            break
        idx = starts[mask] + j
        group = (v[mask] >> np.uint64(7 * j)) & np.uint64(0x7F)
        cont = (nbytes[mask] - 1) > j  # continuation bit
        out[idx] = group.astype(np.uint8) | (cont.astype(np.uint8) << 7)
    return out.tobytes()


def decode_varints(buf: bytes | np.ndarray, count: int | None = None) -> np.ndarray:
    """Decode LEB128 bytes back to uint64; vectorized."""
    b = np.frombuffer(buf, dtype=np.uint8) if not isinstance(buf, np.ndarray) else buf
    if b.size == 0:
        return np.empty(0, dtype=np.uint64)
    is_last = (b & 0x80) == 0
    # value i spans bytes (ends[i-1], ends[i]]
    ends = np.flatnonzero(is_last)
    starts = np.empty_like(ends)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    n = ends.size
    vals = np.zeros(n, dtype=np.uint64)
    width = ends - starts + 1
    payload = (b & 0x7F).astype(np.uint64)
    for j in range(int(width.max())):
        mask = width > j
        vals[mask] |= payload[starts[mask] + j] << np.uint64(7 * j)
    if count is not None and n != count:
        raise ValueError(f"decoded {n} varints, expected {count}")
    return vals
