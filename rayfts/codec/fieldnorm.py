"""Fieldnorm (document length) codecs.

tantivy 0.18 quantizes per-doc-per-field token counts to one byte via a
static 256-entry table (``src/fieldnorm/code.rs``, public tantivy
source): ids 0..=40 decode exactly to 0..=40; above 40 the table is a
3-bit-mantissa floating-point ladder — 8 ids per octave with the step
doubling each octave (42,44,..,56 step 2; 60,64,..,88 step 4;
96,104,..,152 step 8; ...), truncated at 256 entries, so the relative
quantization error above 40 tokens is bounded by ~12.5%. Encoding maps
a count to the LARGEST id whose decoded value <= count
(``fieldnorm_to_id`` = ``binary_search .. unwrap_or_else(|idx| idx-1)``).

Codecs:

- ``"tantivy_like"`` (default): the table above — BM25 score parity with
  tantivy 0.18 for any document length.
- ``"exact"``: u32 token counts, no quantization (used by indexes whose
  results are checked against a SQL oracle that computes true lengths).
"""

from __future__ import annotations

import numpy as np


def _build_table() -> np.ndarray:
    """tantivy 0.18 FIELD_NORMS_TABLE: exact 0..=40, then 8 ids per
    octave with doubling step, truncated to 256 entries. Anchor values
    (ids 41,48,49,56,57,64,248,255 -> 42,56,60,88,96,152,1073741848,
    2013265944) pin the construction; end-of-octave-k value is
    2**(k+4) + 24."""
    vals = list(range(41))
    v, step = 40, 2
    while len(vals) < 256:
        for _ in range(8):
            v += step
            vals.append(v)
            if len(vals) == 256:
                break
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
