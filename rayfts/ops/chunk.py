"""Sliding-window document chunking for training / retrieval ingestion.

Splits each document into fixed-size codepoint windows with overlap —
the standard pre-tokenization step for context-window packing and for
passage-level retrieval indexing (public convention used by RAG
pipelines and long-document training preprocessing).

Semantics (identical in the SQL oracle):

- windows are CODEPOINT ranges ``[i*stride, i*stride + chunk_chars)``
  with ``stride = chunk_chars - overlap``;
- a document of length L > 0 yields ``max(1, ceil((L - overlap) /
  stride))`` chunks — one whole-doc chunk when L <= chunk_chars, and a
  final shorter tail chunk otherwise; an empty/null document yields
  ZERO chunks;
- output rows are ``(id_col, chunk_id, chunk_start, chunk_text)`` with
  ``chunk_id`` counting from 0 within the document.

Scale shape: a stateless ``map_batches`` flat-map — each output chunk
is sliced with ONE vectorized ``pc.utf8_slice_codeunits`` kernel per
chunk ordinal (the per-batch loop is over the max chunk count in the
batch, not over rows), so there is no per-row Python and no shuffle;
downstream consumers see blocks that grow ~L/stride-fold, so pick
``batch_size`` such that batch x expansion fits the worker heap.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def chunk_documents(
    ds,
    col: str = "text",
    id_col: str = "doc_id",
    chunk_chars: int = 2048,
    overlap: int = 256,
    batch_size: int = 1024,
):
    """Lazy Dataset of overlapping codepoint-window chunks (see module
    doc for exact window math)."""
    if not 0 <= overlap < chunk_chars:
        raise ValueError("need 0 <= overlap < chunk_chars")
    stride = chunk_chars - overlap

    def fn(batch: pa.Table) -> pa.Table:
        arr = batch[col]
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        if pa.types.is_null(arr.type):
            arr = arr.cast(pa.string())
        arr = pc.fill_null(arr, "")
        ids = batch[id_col]
        lens = pc.utf8_length(arr).to_numpy().astype(np.int64)
        n_chunks = np.maximum(1, -(-(lens - overlap) // stride))
        n_chunks[lens == 0] = 0
        max_c = int(n_chunks.max()) if n_chunks.size else 0

        id_parts, cid_parts, start_parts, text_parts = [], [], [], []
        for i in range(max_c):
            sel = n_chunks > i  # docs that have an i-th chunk
            idx = np.flatnonzero(sel)
            if idx.size == 0:
                continue
            sub = arr.take(pa.array(idx))
            start = i * stride
            text_parts.append(pc.utf8_slice_codeunits(
                sub, start=start, stop=start + chunk_chars))
            id_parts.append(ids.take(pa.array(idx)))
            cid_parts.append(np.full(idx.size, i, dtype=np.int64))
            start_parts.append(np.full(idx.size, start, dtype=np.int64))
        if not id_parts:
            return pa.table({
                id_col: pa.array([], type=ids.type),
                "chunk_id": pa.array([], type=pa.int64()),
                "chunk_start": pa.array([], type=pa.int64()),
                "chunk_text": pa.array([], type=pa.string()),
            })
        return pa.table({
            id_col: pa.concat_arrays(
                [p.combine_chunks() if isinstance(p, pa.ChunkedArray) else p
                 for p in id_parts]),
            "chunk_id": pa.array(np.concatenate(cid_parts), type=pa.int64()),
            "chunk_start": pa.array(np.concatenate(start_parts),
                                    type=pa.int64()),
            "chunk_text": pa.concat_arrays(
                [p.combine_chunks() if isinstance(p, pa.ChunkedArray) else p
                 for p in text_parts]).cast(pa.string()),
        })

    return ds.select_columns([id_col, col]).map_batches(
        fn, batch_format="pyarrow", batch_size=batch_size)
