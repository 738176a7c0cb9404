"""Fieldnorm (document length) codecs.

tantivy 0.18 quantizes per-doc-per-field token counts to one byte via a
256-entry table whose ids 0..=40 decode exactly to 0..=40 and whose tail
grows geometrically (SURVEY.md §8.3). The exact tail values of tantivy's
table were not retrievable in this sandbox, so the codec is pluggable:

- ``"tantivy_like"`` (default): ids 0..=40 exact; above 40 a documented
  2-bit-mantissa geometric table (groups of 4 ids, step doubling each
  group: 42,44,46,48, 52,56,60,64, 72,80,88,96, 112,...). Encoding maps a
  count to the largest id whose decoded value <= count. All BM25 parity
  tests keep fields < 41 tokens, where this codec is the identity.
- ``"exact"``: u32 token counts, no quantization (used by indexes whose
  results are checked against a SQL oracle that computes true lengths).
"""

from __future__ import annotations

import numpy as np


def _build_table() -> np.ndarray:
    vals = list(range(41))
    step, in_group = 2, 0
    v = 40
    while len(vals) < 256:
        v += step
        vals.append(v)
        in_group += 1
        if in_group == 4:
            in_group = 0
            step *= 2
    return np.array(vals, dtype=np.int64)


_TABLE = _build_table()


class FieldNormCodec:
    EXACT = "exact"
    TANTIVY_LIKE = "tantivy_like"

    def __init__(self, kind: str = TANTIVY_LIKE):
        if kind not in (self.EXACT, self.TANTIVY_LIKE):
            raise ValueError(f"unknown fieldnorm codec {kind!r}")
        self.kind = kind

    @property
    def dtype(self) -> np.dtype:
        return np.dtype(np.uint32) if self.kind == self.EXACT else np.dtype(np.uint8)

    def encode(self, counts: np.ndarray) -> np.ndarray:
        counts = np.asarray(counts, dtype=np.int64)
        if self.kind == self.EXACT:
            return counts.astype(np.uint32)
        # largest id whose decoded value <= count
        ids = np.searchsorted(_TABLE, counts, side="right") - 1
        return np.clip(ids, 0, 255).astype(np.uint8)

    def decode(self, ids: np.ndarray) -> np.ndarray:
        ids = np.asarray(ids)
        if self.kind == self.EXACT:
            return ids.astype(np.int64)
        return _TABLE[ids.astype(np.int64)]

    def decode_one(self, i: int) -> int:
        return int(self.decode(np.array([i]))[0])

    def to_json(self) -> str:
        return self.kind

    @staticmethod
    def from_json(kind: str) -> "FieldNormCodec":
        return FieldNormCodec(kind)
