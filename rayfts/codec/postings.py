"""Posting-list codec: 128-doc blocks, varint docid deltas, bitpacked
term frequencies, skip entries with block-max metadata.

Layout of one encoded posting list (little-endian):

    u32  n_docs
    u32  docid_stream_bytes
    skip entries, one per block of <=128 docs, 14 bytes each:
        u32  last_docid          (segment-local docid of block's last doc)
        u32  docid_byte_off      (offset of block's first delta in stream)
        u8   tf_bits             (bit width of packed (tf-1) values)
        u32  block_max_tf        (max tf in block          — block-max WAND)
        u8   block_min_norm      (min fieldnorm id in block — block-max WAND)
    docid delta stream: LEB128 varints; delta[0] = docid[0], others diffs
        (cumsum over the whole stream reconstructs docids; each block's
        deltas are also independently decodable from its byte offset given
        the previous block's last_docid)
    tf stream: per block, (tf-1) bitpacked LSB-first at tf_bits bits,
        each block padded to a byte boundary (tf_bits == 0 => no bytes).

The (block_max_tf, block_min_norm) pair yields a valid per-block upper
bound on BM25: the score is increasing in tf and decreasing in document
length, so bound = f(max tf, min dl) evaluated with query-time avgdl.
Mirrors the role of tantivy-0.18 block-max metadata (SURVEY.md §7.2.3;
north star "skip blocks with block-max metadata").
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from rayfts.codec.varint import encode_varints, decode_varints

BLOCK_SIZE = 128
_SKIP_DTYPE = np.dtype(
    [
        ("last_docid", "<u4"),
        ("docid_off", "<u4"),
        ("tf_bits", "u1"),
        ("max_tf", "<u4"),
        ("min_norm", "u1"),
    ]
)


@dataclass
class PostingList:
    docids: np.ndarray  # uint32, sorted ascending, segment-local
    tfs: np.ndarray  # uint32, >= 1
    skips: np.ndarray  # structured _SKIP_DTYPE array (decode only)

    @property
    def doc_freq(self) -> int:
        return int(self.docids.size)


def _pack_bits(values: np.ndarray, bits: int) -> bytes:
    if bits == 0 or values.size == 0:
        return b""
    v = values.astype(np.uint32)
    bit_matrix = ((v[:, None] >> np.arange(bits, dtype=np.uint32)[None, :]) & 1).astype(np.uint8)
    return np.packbits(bit_matrix.ravel(), bitorder="little").tobytes()


def _unpack_bits(buf: np.ndarray, n: int, bits: int) -> np.ndarray:
    if bits == 0:
        return np.zeros(n, dtype=np.uint32)
    bitarr = np.unpackbits(buf, bitorder="little")[: n * bits]
    weights = (1 << np.arange(bits, dtype=np.uint32)).astype(np.uint32)
    return bitarr.reshape(n, bits).astype(np.uint32) @ weights


def encode_postings(
    docids: np.ndarray, tfs: np.ndarray, norms: np.ndarray | None = None
) -> bytes:
    """Encode one posting list. ``norms`` = fieldnorm id per posting (same
    length as docids); defaults to 0 (exact-norm indexes store min_norm=0
    and fall back to tf-only bounds)."""
    docids = np.asarray(docids, dtype=np.uint32)
    tfs = np.asarray(tfs, dtype=np.uint32)
    n = docids.size
    if n == 0:
        raise ValueError("empty posting list")
    if norms is None:
        norms = np.zeros(n, dtype=np.uint8)
    deltas = np.empty(n, dtype=np.uint64)
    deltas[0] = docids[0]
    np.subtract(docids[1:], docids[:-1], out=deltas[1:], casting="unsafe")
    nblocks = (n + BLOCK_SIZE - 1) // BLOCK_SIZE

    skip = np.zeros(nblocks, dtype=_SKIP_DTYPE)
    docid_chunks: list[bytes] = []
    tf_chunks: list[bytes] = []
    off = 0
    for b in range(nblocks):
        lo, hi = b * BLOCK_SIZE, min((b + 1) * BLOCK_SIZE, n)
        chunk = encode_varints(deltas[lo:hi])
        tf_block = tfs[lo:hi]
        tf_minus1 = tf_block - 1
        mx = int(tf_minus1.max())
        bits = mx.bit_length()
        skip[b]["last_docid"] = docids[hi - 1]
        skip[b]["docid_off"] = off
        skip[b]["tf_bits"] = bits
        skip[b]["max_tf"] = int(tf_block.max())
        skip[b]["min_norm"] = int(np.asarray(norms[lo:hi]).min())
        docid_chunks.append(chunk)
        tf_chunks.append(_pack_bits(tf_minus1, bits))
        off += len(chunk)
    docid_stream = b"".join(docid_chunks)
    header = np.array([n, len(docid_stream)], dtype="<u4").tobytes()
    return header + skip.tobytes() + docid_stream + b"".join(tf_chunks)


def decode_postings(buf: bytes | memoryview | np.ndarray) -> PostingList:
    """Decode a full posting list (vectorized)."""
    raw = np.frombuffer(buf, dtype=np.uint8)
    n, docid_bytes = np.frombuffer(raw[:8].tobytes(), dtype="<u4")
    n = int(n)
    nblocks = (n + BLOCK_SIZE - 1) // BLOCK_SIZE
    skip_end = 8 + nblocks * _SKIP_DTYPE.itemsize
    skips = np.frombuffer(raw[8:skip_end].tobytes(), dtype=_SKIP_DTYPE)
    docid_end = skip_end + int(docid_bytes)
    deltas = decode_varints(raw[skip_end:docid_end], count=n)
    docids = np.cumsum(deltas, dtype=np.uint64).astype(np.uint32)

    tfs = np.empty(n, dtype=np.uint32)
    pos = docid_end
    for b in range(nblocks):
        lo, hi = b * BLOCK_SIZE, min((b + 1) * BLOCK_SIZE, n)
        bits = int(skips[b]["tf_bits"])
        nbytes = (bits * (hi - lo) + 7) // 8
        tfs[lo:hi] = _unpack_bits(raw[pos : pos + nbytes], hi - lo, bits) + 1
        pos += nbytes
    return PostingList(docids=docids, tfs=tfs, skips=skips)


def decode_skips(buf: bytes | memoryview | np.ndarray) -> tuple[int, np.ndarray]:
    """Read only (n_docs, skip table) — for block-max pruning decisions
    without decoding the payload."""
    raw = np.frombuffer(buf, dtype=np.uint8)
    n = int(np.frombuffer(raw[:4].tobytes(), dtype="<u4")[0])
    nblocks = (n + BLOCK_SIZE - 1) // BLOCK_SIZE
    skips = np.frombuffer(raw[8 : 8 + nblocks * _SKIP_DTYPE.itemsize].tobytes(), dtype=_SKIP_DTYPE)
    return n, skips
