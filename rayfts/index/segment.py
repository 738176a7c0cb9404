"""Immutable index segments: build (invert) and read.

A segment is the unit of parallel index construction and of checkpoint /
resume — the Ray-native analogue of a tantivy segment (6 files + an
entry in meta.json, ``/root/reference/src-nodejs/catalog.js:5-13``).
One segment directory holds:

    terms.parquet   term dictionary, sorted by (field, term):
                    field, term, df, total_tf, post_off, post_len,
                    pos_off, pos_len
    postings.bin    concatenated encoded posting lists (rayfts.codec.postings)
    positions.bin   concatenated varint position-delta streams, one span
                    per term (within a span: runs of ``tf`` deltas per doc,
                    run starts absolute, rest diffs)
    norms.npz       per indexed field: fieldnorm id per local docid
    store.parquet   stored fields; row index == local docid
    segment.json    num_docs, per-field token totals, lineage, metrics

The inversion is fully vectorized: whole-column Arrow tokenization (RE2
``split_pattern_regex`` + ``dictionary_encode``; lower/stem once per
UNIQUE surface token — ``Analyzer.analyze_text_column``), then
``numpy.lexsort`` to group (term, doc) pairs and one batch posting
encode. No Python loop over rows or tokens in the hot path.
"""

from __future__ import annotations

import json
import os
import time
from collections import OrderedDict
from dataclasses import dataclass, field as dc_field

_MISSING = object()


class _LazyTermEntry(dict):
    """Term-dictionary entry whose ``"terms"`` numpy-object array (one
    PyString per vocabulary term) materializes only when a range / fuzzy
    / merge scan asks for it; point lookups bisect the Arrow array."""

    def __missing__(self, key):
        if key == "terms":
            v = np.asarray(self["terms_pa"].to_pylist(), dtype=object)
            self[key] = v
            return v
        if key == "term_lens":  # codepoint lengths, Arrow-vectorized
            v = pa.compute.utf8_length(
                self["terms_pa"]).to_numpy(zero_copy_only=False).astype(np.int64)
            self[key] = v
            return v
        if key == "term_sigs":  # 64-bit character-SET signatures
            # One edit changes at most one distinct character on each
            # side, so |chars(q)\chars(t)| <= d is NECESSARY for
            # distance <= d; hash collisions only merge bits, which
            # UNDERCOUNTS the difference — the fuzzy prefilter built on
            # these never drops a true match. Computed chunked so the
            # transient (chunk, lmax) codepoint matrix stays small.
            terms = self["terms"]
            n = terms.size
            sigs = np.zeros(n, dtype=np.uint64)
            lens = self["term_lens"]
            step = 1 << 16
            for s in range(0, n, step):
                part = terms[s:s + step]
                lmax = int(lens[s:s + step].max(initial=0))
                if lmax == 0:
                    continue
                U = np.asarray(part, dtype=f"<U{lmax}").view(
                    np.uint32).reshape(len(part), lmax)
                bits = ((U.astype(np.uint64) *
                         np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(58))
                lanes = np.where(U != 0, np.uint64(1) << bits, np.uint64(0))
                sigs[s:s + step] = np.bitwise_or.reduce(lanes, axis=1)
            self[key] = sigs
            return sigs
        raise KeyError(key)

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from rayfts.analysis.analyzer import Analyzer
from rayfts.codec.fieldnorm import FieldNormCodec
from rayfts.codec.postings import PostingList, decode_postings, encode_postings_batch
from rayfts.codec.varint import decode_varints, encode_varints, varint_lengths
from rayfts.index.schema import FACET, IndexSchema, TEXT

TERMS_FILE = "terms.parquet"
POSTINGS_FILE = "postings.bin"
POSITIONS_FILE = "positions.bin"
NORMS_FILE = "norms.npz"
STORE_FILE = "store.parquet"
META_FILE = "segment.json"
FACETS_FILE = "facets.parquet"       # per-field facet path dictionary
FACET_CODES_FILE = "facet_codes.npz"  # per-field int32 code per local docid


@dataclass
class SegmentInfo:
    segment_id: str
    num_docs: int
    field_stats: dict  # field -> {"total_tokens": int, "num_terms": int}
    lineage: dict = dc_field(default_factory=dict)
    metrics: dict = dc_field(default_factory=dict)
    fieldnorm_codec: str = FieldNormCodec.TANTIVY_LIKE

    def to_json(self) -> dict:
        return {
            "segment_id": self.segment_id,
            "num_docs": self.num_docs,
            "field_stats": self.field_stats,
            "lineage": self.lineage,
            "metrics": self.metrics,
            "fieldnorm_codec": self.fieldnorm_codec,
        }

    @staticmethod
    def from_json(d: dict) -> "SegmentInfo":
        return SegmentInfo(
            segment_id=d["segment_id"], num_docs=d["num_docs"],
            field_stats=d["field_stats"], lineage=d.get("lineage", {}),
            metrics=d.get("metrics", {}),
            fieldnorm_codec=d.get("fieldnorm_codec", FieldNormCodec.TANTIVY_LIKE),
        )


def _encode_position_stream(pos_sorted: np.ndarray, run_starts: np.ndarray) -> np.ndarray:
    """Delta-encode a concatenated position stream: absolute at run starts
    (one run per (term, doc) posting), diffs elsewhere. Returns uint64."""
    deltas = np.empty(pos_sorted.size, dtype=np.int64)
    deltas[0] = pos_sorted[0]
    deltas[1:] = pos_sorted[1:] - pos_sorted[:-1]
    deltas[run_starts] = pos_sorted[run_starts]
    return deltas.astype(np.uint64)


def write_facet_sidecar(dir_path: str, columns: dict[str, pa.ChunkedArray | pa.Array]) -> None:
    """Write the facet dictionary sidecar for a segment directory:
    ``facet_codes.npz`` (int32 code per local docid, -1 = null) and
    ``facets.parquet`` (field, code, path) with paths sorted per field so
    codes are ordinal in path order. Shared by build and merge."""
    if not columns:
        return
    codes_out: dict[str, np.ndarray] = {}
    rows = {"field": [], "code": [], "path": []}
    for name, col in columns.items():
        vals = col.to_numpy(zero_copy_only=False) if hasattr(col, "to_numpy") else np.asarray(col)
        codes, uniques = pd.factorize(vals, sort=True)
        codes_out[name] = codes.astype(np.int32)
        rows["field"].extend([name] * len(uniques))
        rows["code"].extend(range(len(uniques)))
        rows["path"].extend(str(u) for u in uniques)
    np.savez(os.path.join(dir_path, FACET_CODES_FILE), **codes_out)
    pq.write_table(
        pa.table(
            {
                "field": pa.array(rows["field"], type=pa.string()),
                "code": pa.array(rows["code"], type=pa.int32()),
                "path": pa.array(rows["path"], type=pa.string()),
            }
        ),
        os.path.join(dir_path, FACETS_FILE),
    )


# per-worker-process analyzer cache: the Porter2 stem cache inside each
# Analyzer amortizes across ALL segments a worker builds (Zipf vocab)
_ANALYZERS: dict[str, Analyzer] = {}


def _analyzer(name: str) -> Analyzer:
    a = _ANALYZERS.get(name)
    if a is None:
        a = _ANALYZERS[name] = Analyzer(name)
    return a


def build_segment(
    table: pa.Table,
    schema: IndexSchema,
    segment_id: str,
    out_dir: str,
    fieldnorm_codec: str = FieldNormCodec.TANTIVY_LIKE,
    order_by: list[str] | None = None,
    lineage: dict | None = None,
    analyzers: dict[str, Analyzer] | None = None,
) -> SegmentInfo:
    """Invert one partition of documents into a segment on disk.

    Writes to ``out_dir + '.tmp'`` then renames — the idempotent,
    resumable write pattern (a crashed task leaves no committed segment;
    mirrors the reference's atomic ``meta.json`` commit discipline,
    ``index.rs:331-336``).
    """
    t0 = time.time()
    n = table.num_rows
    if order_by:
        idx = pa.compute.sort_indices(
            table, sort_keys=[(c, "ascending") for c in order_by]
        )
        table = table.take(idx)
    analyzers = analyzers or {}
    codec = FieldNormCodec(fieldnorm_codec)

    tmp_dir = out_dir + ".tmp"
    os.makedirs(tmp_dir, exist_ok=True)

    term_rows = {
        "field": [], "term": [], "df": [], "total_tf": [],
        "post_off": [], "post_len": [], "pos_off": [], "pos_len": [],
    }
    postings_chunks: list[bytes] = []
    positions_chunks: list[bytes] = []
    post_off = 0
    pos_off = 0
    norms_out: dict[str, np.ndarray] = {}
    field_stats: dict[str, dict] = {}
    total_token_count = 0

    for fdef in schema.indexed_fields:
        analyzer = analyzers.get(fdef.tokenizer) or _analyzer(fdef.tokenizer)
        spec = analyzer.spec
        col = table[fdef.name] if fdef.name in table.column_names else None
        fast_ok = (
            fdef.type == TEXT
            and not spec.raw
            and spec.name != "whitespace"
            and col is not None
            and (pa.types.is_string(col.type) or pa.types.is_large_string(col.type))
        )
        if fast_ok:
            # Arrow-native whole-column path (RE2 split + dictionary_encode;
            # per-UNIQUE-token filter/lower/stem) — the hot path.
            codes, doc_idx, positions, uniq_arr, counts = (
                analyzer.analyze_text_column(col)
            )
            uniques = uniq_arr
            total_tokens = int(codes.size)
        else:
            if fdef.type == TEXT:
                texts = col.to_pylist() if col is not None else [None] * n
            else:
                # numeric fields index their canonical string form as a raw term
                texts = [None if v is None else str(v) for v in table[fdef.name].to_pylist()]

            tok_lists: list[list[str]] = []
            pos_lists: list[list[int] | None] = []
            for txt in texts:
                toks, poss = analyzer.tokens_positions_fast(txt)
                tok_lists.append(toks)
                pos_lists.append(poss)
            counts = np.fromiter((len(t) for t in tok_lists), dtype=np.int64, count=n)
            total_tokens = int(counts.sum())
            if total_tokens:
                all_toks = np.empty(total_tokens, dtype=object)
                k = 0
                for toks in tok_lists:
                    if toks:
                        all_toks[k : k + len(toks)] = toks
                        k += len(toks)
                doc_idx = np.repeat(np.arange(n, dtype=np.int64), counts)
                # positions: identity (0..len-1) per doc unless the analyzer
                # reported explicit ordinals (dropped tokens)
                offsets = np.concatenate([[0], np.cumsum(counts)[:-1]])
                positions = np.arange(total_tokens, dtype=np.int64) - np.repeat(offsets, counts)
                k = 0
                for ci, pl in enumerate(pos_lists):
                    if pl is not None and len(pl):
                        positions[k : k + len(pl)] = pl
                    k += counts[ci]
                codes, uniques = pd.factorize(all_toks, sort=True)

        norms_out[fdef.name] = codec.encode(counts)
        total_token_count += total_tokens

        if total_tokens == 0:
            field_stats[fdef.name] = {"total_tokens": 0, "num_terms": 0}
            continue

        # one stable sort on the int32 term codes alone: the token stream is
        # emitted doc-major with ascending positions, so stability yields
        # the full (term, doc, position) order — the inversion is memory-
        # bandwidth-bound at full-node concurrency and this is its cheapest
        # possible ordering pass
        order = np.argsort(codes, kind="stable")
        s_codes = codes[order]
        s_docs = doc_idx[order]
        s_pos = positions[order]

        # posting boundaries: change of (code, doc)
        change = np.empty(total_tokens, dtype=bool)
        change[0] = True
        change[1:] = (s_codes[1:] != s_codes[:-1]) | (s_docs[1:] != s_docs[:-1])
        run_starts = np.flatnonzero(change)
        run_ends = np.append(run_starts[1:], total_tokens)
        tfs = (run_ends - run_starts).astype(np.uint32)
        p_docs = s_docs[run_starts].astype(np.uint32)
        p_codes = s_codes[run_starts]

        # term boundaries over the posting runs
        tchange = np.empty(run_starts.size, dtype=bool)
        tchange[0] = True
        tchange[1:] = p_codes[1:] != p_codes[:-1]
        t_starts = np.flatnonzero(tchange)
        t_ends = np.append(t_starts[1:], run_starts.size)

        norm_ids_field = norms_out[fdef.name]
        if codec.kind == FieldNormCodec.TANTIVY_LIKE:
            p_norms = norm_ids_field[p_docs]
        else:
            p_norms = np.zeros(p_docs.size, dtype=np.uint8)

        nterms = t_starts.size
        # all posting lists of this field encoded in ONE vectorized pass
        blob, t_offs, t_lens = encode_postings_batch(
            p_docs, tfs, p_norms, t_starts, t_ends
        )
        postings_chunks.append(blob)

        # per-posting tf sums per term (vectorized)
        tf_cum = np.concatenate([[0], np.cumsum(tfs.astype(np.int64))])
        term_total_tf = tf_cum[t_ends] - tf_cum[t_starts]

        want_positions = fdef.has_positions
        if want_positions:
            # one whole-field position stream; per-term byte spans by cumsum
            pos_deltas = _encode_position_stream(s_pos, run_starts)
            pos_vlens = varint_lengths(pos_deltas)
            pos_blob = encode_varints(pos_deltas, pos_vlens)
            positions_chunks.append(pos_blob)
            pos_byte_cum = np.concatenate([[0], np.cumsum(pos_vlens)])
            term_tok_starts = run_starts[t_starts]
            term_tok_ends = run_ends[t_ends - 1]
            pos_offs = pos_off + pos_byte_cum[term_tok_starts]
            pos_lens = pos_byte_cum[term_tok_ends] - pos_byte_cum[term_tok_starts]
            pos_off += len(pos_blob)
        else:
            pos_offs = np.full(nterms, -1, dtype=np.int64)
            pos_lens = np.zeros(nterms, dtype=np.int64)

        uniq_list = uniques.tolist()
        term_rows["field"].extend([fdef.name] * nterms)
        term_rows["term"].extend(uniq_list[c] for c in p_codes[t_starts])
        term_rows["df"].extend((t_ends - t_starts).tolist())
        term_rows["total_tf"].extend(term_total_tf.tolist())
        term_rows["post_off"].extend((t_offs + post_off).tolist())
        term_rows["post_len"].extend(t_lens.tolist())
        term_rows["pos_off"].extend(pos_offs.tolist())
        term_rows["pos_len"].extend(pos_lens.tolist())
        post_off += len(blob)

        field_stats[fdef.name] = {
            "total_tokens": total_tokens,
            "num_terms": int(nterms),
        }

    terms_table = pa.table(
        {
            "field": pa.array(term_rows["field"], type=pa.string()),
            "term": pa.array(term_rows["term"], type=pa.string()),
            "df": pa.array(term_rows["df"], type=pa.uint32()),
            "total_tf": pa.array(term_rows["total_tf"], type=pa.int64()),
            "post_off": pa.array(term_rows["post_off"], type=pa.int64()),
            "post_len": pa.array(term_rows["post_len"], type=pa.int64()),
            "pos_off": pa.array(term_rows["pos_off"], type=pa.int64()),
            "pos_len": pa.array(term_rows["pos_len"], type=pa.int64()),
        }
    )
    pq.write_table(terms_table, os.path.join(tmp_dir, TERMS_FILE))
    with open(os.path.join(tmp_dir, POSTINGS_FILE), "wb") as f:
        f.write(b"".join(postings_chunks))
    with open(os.path.join(tmp_dir, POSITIONS_FILE), "wb") as f:
        f.write(b"".join(positions_chunks))
    np.savez(os.path.join(tmp_dir, NORMS_FILE), **norms_out)

    # facet fields: dictionary-encode '/a/b' paths at build time (code per
    # doc + sorted path dictionary) so the facet collector is one bincount
    # over matched docs instead of a string scan (tantivy indexes facets
    # as a term dictionary — SURVEY.md §2.3 #26)
    write_facet_sidecar(
        tmp_dir,
        {
            f.name: table[f.name]
            for f in schema.fields
            if f.type == FACET and f.name in table.column_names
        },
    )

    stored_cols = [f.name for f in schema.stored_fields if f.name in table.column_names]
    extra_cols = [c for c in table.column_names if c.startswith("__") or c == "content_sha256"]
    store_table = table.select(stored_cols + [c for c in extra_cols if c not in stored_cols])
    pq.write_table(store_table, os.path.join(tmp_dir, STORE_FILE))

    info = SegmentInfo(
        segment_id=segment_id,
        num_docs=n,
        field_stats=field_stats,
        lineage=lineage or {},
        metrics={
            "build_secs": round(time.time() - t0, 4),
            "tokens": total_token_count,
            "postings_bytes": post_off,
            "positions_bytes": pos_off,
        },
        fieldnorm_codec=fieldnorm_codec,
    )
    with open(os.path.join(tmp_dir, META_FILE), "w") as f:
        json.dump(info.to_json(), f)
    if os.path.isdir(out_dir):
        # another (retried) task already committed this segment — keep it
        import shutil

        shutil.rmtree(tmp_dir)
    else:
        os.replace(tmp_dir, out_dir)
    return info


_TERMS_CACHE: "OrderedDict[tuple, pa.Table]" = OrderedDict()
_TERMS_CACHE_MAX = 16


def _read_terms_table(path: str) -> pa.Table:
    """Per-process cache of terms tables keyed by (path, mtime_ns, size).

    Segment files are immutable once committed (tmp+rename), so the key
    only changes if a path is ever reused for different bytes. The cache
    exists for the term-sharded merge: every shard task builds its own
    SegmentReader per source, and without it a 16-shard merge of a
    16-source group parses the same 16 terms parquets 256 times in the
    same reused worker processes."""
    st = os.stat(path)
    key = (os.path.abspath(path), st.st_mtime_ns, st.st_size)
    t = _TERMS_CACHE.get(key)
    if t is not None:
        _TERMS_CACHE.move_to_end(key)
        return t
    t = pq.read_table(path)
    _TERMS_CACHE[key] = t
    while len(_TERMS_CACHE) > _TERMS_CACHE_MAX:
        _TERMS_CACHE.popitem(last=False)
    return t


class SegmentReader:
    """Mmap-backed reader of one segment. Term dictionary loads lazily per
    field; postings/positions are addressed through ``np.memmap`` so the
    OS page cache is the only copy (cheap enough to hold one reader per
    segment inside each query actor)."""

    def __init__(self, path: str, schema: IndexSchema):
        self.path = path
        self.schema = schema
        with open(os.path.join(path, META_FILE)) as f:
            self.info = SegmentInfo.from_json(json.load(f))
        self.codec = FieldNormCodec(self.info.fieldnorm_codec)
        self._terms_by_field: dict[str, dict] = {}
        self._postings_mm: np.memmap | None = None
        self._positions_mm: np.memmap | None = None
        self._norms: dict[str, np.ndarray] | None = None
        self._store: pa.Table | None = None
        self._terms_table: pa.Table | None = None
        self._facets: dict[str, tuple[np.ndarray, np.ndarray]] = {}
        self._decoded_norms: dict[str, np.ndarray] = {}
        # serving caches: decoded hot posting lists (LRU by posting count —
        # repeated terms across a query stream decode once per segment) and
        # term->ordinal lookups (binary search over an object array is a
        # measurable per-query cost; None misses are cached too)
        self._postings_cache: "OrderedDict[tuple[str, int], PostingList]" = OrderedDict()
        self._postings_cached_docs = 0
        self.postings_cache_max_docs = 8_000_000  # ~64 MiB of uint32 pairs
        self._ordinal_cache: dict[tuple[str, str], int | None] = {}

    # -- lazy loads ----------------------------------------------------
    def _terms(self, field: str) -> dict:
        cached = self._terms_by_field.get(field)
        if cached is not None:
            return cached
        if self._terms_table is None:
            self._terms_table = _read_terms_table(
                os.path.join(self.path, TERMS_FILE))
        t = self._terms_table
        mask = pa.compute.equal(t["field"], field)
        sub = t.filter(mask)
        entry = _LazyTermEntry({
            "terms_pa": sub["term"].combine_chunks(),
            "df": sub["df"].to_numpy(),
            "total_tf": sub["total_tf"].to_numpy(),
            "post_off": sub["post_off"].to_numpy(),
            "post_len": sub["post_len"].to_numpy(),
            "pos_off": sub["pos_off"].to_numpy(),
            "pos_len": sub["pos_len"].to_numpy(),
        })
        self._terms_by_field[field] = entry
        return entry

    def _postings_buf(self) -> np.ndarray:
        if self._postings_mm is None:
            p = os.path.join(self.path, POSTINGS_FILE)
            self._postings_mm = (
                np.memmap(p, dtype=np.uint8, mode="r")
                if os.path.getsize(p)
                else np.empty(0, dtype=np.uint8)
            )
        return self._postings_mm

    def _positions_buf(self) -> np.ndarray:
        if self._positions_mm is None:
            p = os.path.join(self.path, POSITIONS_FILE)
            self._positions_mm = (
                np.memmap(p, dtype=np.uint8, mode="r")
                if os.path.getsize(p)
                else np.empty(0, dtype=np.uint8)
            )
        return self._positions_mm

    # -- public API ----------------------------------------------------
    @property
    def num_docs(self) -> int:
        return self.info.num_docs

    def term_ordinal(self, field: str, term: str) -> int | None:
        key = (field, term)
        cached = self._ordinal_cache.get(key, _MISSING)
        if cached is not _MISSING:
            return cached
        e = self._terms(field)
        # bisect over the Arrow string array (no bulk string
        # materialization on the point-lookup path — a vocabulary of 10^6
        # terms is 10^6 PyStrings the searcher would never need); fall
        # back to the numpy array if a range/fuzzy scan already built it
        arr_np = e.get("terms")
        if arr_np is not None:
            i = int(np.searchsorted(arr_np, term))
            out = i if i < arr_np.size and arr_np[i] == term else None
        else:
            arr = e["terms_pa"]
            lo, hi = 0, len(arr)
            while lo < hi:
                mid = (lo + hi) // 2
                if arr[mid].as_py() < term:
                    lo = mid + 1
                else:
                    hi = mid
            out = lo if lo < len(arr) and arr[lo].as_py() == term else None
        if len(self._ordinal_cache) < 1_000_000:
            self._ordinal_cache[key] = out
        return out

    def doc_freq(self, field: str, term: str) -> int:
        i = self.term_ordinal(field, term)
        return int(self._terms(field)["df"][i]) if i is not None else 0

    def postings(self, field: str, term: str) -> PostingList | None:
        i = self.term_ordinal(field, term)
        if i is None:
            return None
        return self.postings_by_ordinal(field, i)

    def postings_by_ordinal(self, field: str, ordinal: int) -> PostingList:
        key = (field, ordinal)
        cache = self._postings_cache
        pl = cache.get(key)
        if pl is not None:
            cache.move_to_end(key)
            return pl
        e = self._terms(field)
        off, ln = int(e["post_off"][ordinal]), int(e["post_len"][ordinal])
        pl = decode_postings(self._postings_buf()[off : off + ln])
        cache[key] = pl
        self._postings_cached_docs += pl.doc_freq
        while self._postings_cached_docs > self.postings_cache_max_docs and cache:
            _, old = cache.popitem(last=False)
            self._postings_cached_docs -= old.doc_freq
        return pl

    def all_postings(
        self, field: str, ord_range: tuple[int, int] | None = None
    ) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
        """Bulk-decode EVERY posting list of a field in three vectorized
        passes (gather payload bytes, one varint decode per stream, cumsum
        with per-term rebase). Returns ``(docids, tfs, starts, ends)``
        where term ordinal i's postings are ``docids[starts[i]:ends[i]]``.
        This is the merge path's workhorse — per-term decode calls would
        dominate a 10-source merge of a 10^5-term vocabulary.

        ``ord_range=(lo, hi)`` restricts the decode to that term-ordinal
        slice (the sharded merge path: one shard touches only its
        contiguous byte range of the postings file); the returned
        starts/ends are then relative to ordinal ``lo``."""
        from rayfts.codec.postings import HEADER_BYTES, SKIP_BYTES, BLOCK_SIZE

        e = self._terms(field)
        sl = slice(*ord_range) if ord_range is not None else slice(None)
        offs = e["post_off"][sl].astype(np.int64)
        lens = e["post_len"][sl].astype(np.int64)
        dfs = e["df"][sl].astype(np.int64)
        nterms = offs.size
        buf = self._postings_buf()
        if nterms == 0:
            z = np.empty(0, np.int64)
            return np.empty(0, np.uint32), np.empty(0, np.uint32), z, z
        nblocks = (dfs + BLOCK_SIZE - 1) // BLOCK_SIZE
        meta = HEADER_BYTES + nblocks * SKIP_BYTES

        # per-term payload spans: docid stream then tf stream, back to back
        hdr_bytes = np.asarray(buf)[offs[:, None] + np.arange(HEADER_BYTES)]
        hdr = hdr_bytes.reshape(-1).view("<u4").reshape(nterms, 3)
        d_lens = hdr[:, 1].astype(np.int64)
        f_lens = hdr[:, 2].astype(np.int64)
        d_starts_in_blob = offs + meta
        f_starts_in_blob = d_starts_in_blob + d_lens

        def gather(starts_b, lens_b):
            total = int(lens_b.sum())
            out_offs = np.concatenate([[0], np.cumsum(lens_b)[:-1]])
            take = np.repeat(starts_b, lens_b) + (
                np.arange(total) - np.repeat(out_offs, lens_b)
            )
            return np.asarray(buf)[take]

        ends = np.cumsum(dfs)
        starts = ends - dfs
        total_docs = int(ends[-1])
        d_deltas = decode_varints(gather(d_starts_in_blob, d_lens), count=total_docs)
        tfm1 = decode_varints(gather(f_starts_in_blob, f_lens), count=total_docs)
        c = np.cumsum(d_deltas.astype(np.int64))
        base = c[starts] - d_deltas[starts].astype(np.int64)
        docids = (c - np.repeat(base, dfs)).astype(np.uint32)
        return docids, (tfm1 + 1).astype(np.uint32), starts, ends

    def positions_flat(
        self, field: str, ordinal: int, tfs: np.ndarray
    ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Decode ALL position lists of a term in one vectorized pass.
        Returns ``(flat, starts, ends)``: absolute positions concatenated in
        docid order; posting i's positions are ``flat[starts[i]:ends[i]]``.
        ``tfs`` = the posting list's tf array (run boundaries)."""
        e = self._terms(field)
        off, ln = int(e["pos_off"][ordinal]), int(e["pos_len"][ordinal])
        if off < 0:
            raise ValueError(f"field {field!r} has no positions (record != 'position')")
        ends = np.cumsum(tfs.astype(np.int64))
        deltas = decode_varints(
            self._positions_buf()[off : off + ln], count=int(ends[-1]) if ends.size else 0
        ).astype(np.int64)
        starts = ends - tfs
        c = np.cumsum(deltas)
        base = c[starts] - deltas[starts]
        flat = c - np.repeat(base, tfs.astype(np.int64))
        return flat, starts, ends

    def positions(self, field: str, ordinal: int, tfs: np.ndarray) -> list[np.ndarray]:
        """Per-posting position arrays (convenience over positions_flat)."""
        flat, starts, ends = self.positions_flat(field, ordinal, tfs)
        return [flat[a:b] for a, b in zip(starts, ends)]

    def term_dict(self, field: str) -> dict:
        """Expose the term dictionary arrays of a field (for range / regex /
        fuzzy scans and merging)."""
        return self._terms(field)

    def norms(self, field: str) -> np.ndarray:
        if self._norms is None:
            with np.load(os.path.join(self.path, NORMS_FILE)) as z:
                self._norms = {k: z[k] for k in z.files}
        return self._norms[field]

    def decoded_norms(self, field: str) -> np.ndarray:
        """Fieldnorm ids decoded to document lengths, cached — the table
        gather is O(num_docs) and sits on every query's scoring path."""
        cached = self._decoded_norms.get(field)
        if cached is None:
            cached = self._decoded_norms[field] = self.codec.decode(self.norms(field))
        return cached

    def store(self) -> pa.Table:
        if self._store is None:
            self._store = pq.read_table(os.path.join(self.path, STORE_FILE))
        return self._store

    def fast_column(self, name: str) -> np.ndarray:
        return self.store()[name].to_numpy(zero_copy_only=False)

    def facet_dict(self, field: str) -> tuple[np.ndarray, np.ndarray]:
        """Facet dictionary of a field: ``(codes, paths)`` where ``codes``
        is an int32 code per local docid (-1 = null) and ``paths`` the
        path per code. Prefers the build-time sidecar; falls back to
        dictionary-encoding the stored column once (cached) for segments
        written without one (e.g. pre-facet-sidecar builds)."""
        cached = self._facets.get(field)
        if cached is not None:
            return cached
        codes = None
        codes_path = os.path.join(self.path, FACET_CODES_FILE)
        if os.path.exists(codes_path):
            with np.load(codes_path) as z:
                if field in z.files:
                    codes = z[field]
        if codes is not None:
            t = pq.read_table(os.path.join(self.path, FACETS_FILE))
            sub = t.filter(pa.compute.equal(t["field"], field))
            paths = np.asarray(sub["path"].to_pylist(), dtype=object)
        else:
            enc = self.store()[field].combine_chunks().dictionary_encode()
            idx = enc.indices
            if idx.null_count:
                idx = pa.compute.fill_null(idx, -1)
            codes = idx.to_numpy(zero_copy_only=False).astype(np.int32)
            paths = np.asarray(enc.dictionary.to_pylist(), dtype=object)
        self._facets[field] = (codes, paths)
        return codes, paths
