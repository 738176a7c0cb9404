"""Vectorized LEB128 varint codec over numpy arrays.

Used for docid deltas and position deltas in the posting format
(SURVEY.md §7.2.3; north star: "docID delta + varint/bitpacked
compression"). Pure numpy — no Python loop over values.
"""

from __future__ import annotations

import numpy as np


# Cache-residency chunk for the multi-pass kernels below: varint codes are
# per-element, so processing a long stream in ~256k-element chunks is
# byte-identical but keeps every pass's working set in L2/L3 instead of
# DRAM — measured ~8x faster on 23M-element posting streams (whose masked
# gather/scatter passes are otherwise DRAM-bandwidth-bound). Chunking also
# localizes the max-driven pass count: chunks of all-small values pay one
# compare even when a few distant values are wide.
_CHUNK = 1 << 18


def varint_lengths(values: np.ndarray) -> np.ndarray:
    """Encoded byte length of each value (vectorized; loop iterations are
    bounded by the chunk MAXIMUM's width, so all-small streams pay one
    compare)."""
    v = np.asarray(values, dtype=np.uint64)
    if v.size > _CHUNK:
        return np.concatenate([
            varint_lengths(v[i : i + _CHUNK]) for i in range(0, v.size, _CHUNK)
        ])
    nbytes = np.ones(v.shape, dtype=np.int64)
    if v.size == 0:
        return nbytes
    maxv = int(v.max())
    bound = 1 << 7
    while maxv >= bound:
        nbytes += v >= np.uint64(bound)
        bound <<= 7
    return nbytes


def encode_varints(values: np.ndarray, lengths: np.ndarray | None = None) -> bytes:
    """LEB128-encode a uint64 array; vectorized (no per-value Python loop).

    ``lengths``: precomputed :func:`varint_lengths` output (callers that
    need per-value byte offsets anyway pass it in to avoid recomputation).
    All-small streams (every value < 128 — the typical tf / small-delta
    case) short-circuit to a single dtype cast.
    """
    v = np.asarray(values, dtype=np.uint64)
    if v.size == 0:
        return b""
    if v.size > _CHUNK:
        return b"".join(
            encode_varints(v[i : i + _CHUNK],
                           None if lengths is None else lengths[i : i + _CHUNK])
            for i in range(0, v.size, _CHUNK)
        )
    nbytes = lengths if lengths is not None else varint_lengths(v)
    maxb = int(nbytes.max())
    if maxb == 1:
        return v.astype(np.uint8).tobytes()
    ends = np.cumsum(nbytes)
    starts = ends - nbytes
    out = np.empty(int(ends[-1]), dtype=np.uint8)
    # For each byte slot j write group j of the values with nbytes > j.
    for j in range(maxb):
        mask = nbytes > j
        idx = starts[mask] + j
        group = (v[mask] >> np.uint64(7 * j)) & np.uint64(0x7F)
        cont = (nbytes[mask] - 1) > j  # continuation bit
        out[idx] = group.astype(np.uint8) | (cont.astype(np.uint8) << 7)
    return out.tobytes()


def decode_varints(buf: bytes | np.ndarray, count: int | None = None) -> np.ndarray:
    """Decode LEB128 bytes back to uint64; vectorized. Streams whose
    values are all < 128 (the common docid-delta / tf case) decode with a
    single widening cast."""
    b = np.frombuffer(buf, dtype=np.uint8) if not isinstance(buf, np.ndarray) else buf
    if b.size == 0:
        return np.empty(0, dtype=np.uint64)
    if count is not None and count == b.size:
        # every value is exactly one byte -> no continuation bits possible
        return b.astype(np.uint64)
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
    # value-chunked width loop (see _CHUNK): per-chunk passes are bounded
    # by the CHUNK's max width and stay cache-resident; a chunk of all
    # 1-byte values pays a single gather
    for c0 in range(0, n, _CHUNK):
        c1 = min(c0 + _CHUNK, n)
        w = width[c0:c1]
        s = starts[c0:c1]
        v = vals[c0:c1]
        for j in range(int(w.max())):
            mask = w > j
            v[mask] |= payload[s[mask] + j] << np.uint64(7 * j)
    if count is not None and n != count:
        raise ValueError(f"decoded {n} varints, expected {count}")
    return vals
