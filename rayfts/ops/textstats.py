"""Text analysis stages for large-scale training-data pipelines:
token counting, quality signals, language-ID heuristic, document
fingerprinting. All are stateless vectorized ``map_batches`` transforms
over Arrow batches (compiled regexes + numpy; no per-row Python in the
dataset API surface beyond C-backed regex/string calls)."""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pyarrow as pa

_TOKEN_RE = re.compile(r"[^\W_]+", re.UNICODE)

# tiny per-language stopword lists (heuristic n-gram/stopword language ID;
# deterministic, dependency-free)
LANG_STOPWORDS: dict[str, frozenset[str]] = {
    "en": frozenset("the of and to in is it that for on with as are was".split()),
    "de": frozenset("der die das und ist nicht ein eine zu mit von für".split()),
    "fr": frozenset("le la les et est une pour dans que vous avec sur".split()),
    "es": frozenset("el la los y es una para en que con por del".split()),
}
_LANG_ORDER = sorted(LANG_STOPWORDS)


def _tokens(text: str) -> list[str]:
    return [t.lower() for t in _TOKEN_RE.findall(text or "")]


# GPT-2-style pre-tokenizer, restricted to RE2-compatible constructs (no
# lookahead) so the DuckDB oracle can run the IDENTICAL pattern; counts
# approximate BPE token counts for budget/packing decisions.
_BPE_RE = re.compile(r" ?[^\W\d_]+| ?\d+| ?[^\s\w]+|\s+", re.UNICODE)
BPE_RE_SQL = r" ?[\p{L}]+| ?[\p{N}]+| ?[^\s\p{L}\p{N}_]+|\s+"


def count_tokens_batch(batch: pa.Table, col: str = "text") -> pa.Table:
    """Token-count columns for budget estimation: ``n_ws_tokens``
    (whitespace split) and ``n_bpe_tokens`` (BPE-ish pre-tokenizer).
    Vectorized: RE2 match counting on the whole column — the same engine
    and the same pattern string the DuckDB oracle runs."""
    import pyarrow.compute as pc

    arr = batch[col]
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    arr = pc.fill_null(arr, "")
    ws = pc.count_substring_regex(arr, pattern=r"\S+").to_numpy().astype(np.int64)
    bpe = pc.count_substring_regex(arr, pattern=BPE_RE_SQL).to_numpy().astype(np.int64)
    return (batch.append_column("n_ws_tokens", pa.array(ws))
            .append_column("n_bpe_tokens", pa.array(bpe)))


def _flat_tokens(batch: pa.Table, col: str):
    """Whole-column tokenize (RE2 split + lower, C++): returns
    (flat_lower_tokens: pa.Array incl. empties, doc_idx, counts_all, n)."""
    import pyarrow.compute as pc

    arr = batch[col]
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    arr = pc.fill_null(arr, "")
    n = len(arr)
    sp = pc.split_pattern_regex(arr, pattern=r"[^\p{L}\p{N}]+")
    counts_all = pc.list_value_length(sp).to_numpy().astype(np.int64)
    flat = pc.utf8_lower(pc.list_flatten(sp))
    doc_idx = np.repeat(np.arange(n, dtype=np.int64), counts_all)
    return flat, doc_idx, counts_all, n


def token_stats_batch(batch: pa.Table, col: str = "text") -> pa.Table:
    """Adds n_tokens, n_types (unique), max_token_len (chars).
    Fully vectorized: Arrow split/lower, per-doc uniques via a fused
    (code, doc) np.unique, reduceat for the max length."""
    import pyarrow.compute as pc

    flat, doc_idx, counts_all, n = _flat_tokens(batch, col)
    lens = pc.utf8_length(flat).to_numpy().astype(np.int64)
    nonempty = lens > 0
    n_tok = np.bincount(doc_idx[nonempty], minlength=n)
    mx = np.zeros(n, dtype=np.int64)
    if doc_idx.size:
        np.maximum.at(mx, doc_idx, lens)
    denc = flat.dictionary_encode()
    codes = denc.indices.to_numpy().astype(np.int64)
    fused = codes * n + doc_idx
    uniq = np.unique(fused[nonempty])
    n_typ = np.bincount((uniq % n).astype(np.int64), minlength=n)
    return (
        batch.append_column("n_tokens", pa.array(n_tok.astype(np.int64)))
        .append_column("n_types", pa.array(n_typ.astype(np.int64)))
        .append_column("max_token_len", pa.array(mx))
    )


def _stopword_hits(flat, doc_idx, n, lang: str) -> np.ndarray:
    import pyarrow.compute as pc

    mask = pc.is_in(
        flat, value_set=pa.array(sorted(LANG_STOPWORDS[lang]), type=flat.type)
    ).to_numpy(zero_copy_only=False)
    return np.bincount(doc_idx[mask], minlength=n).astype(np.int64)


def quality_stats_batch(batch: pa.Table, col: str = "text") -> pa.Table:
    """Quality signals as exact integers (SQL-oracle friendly):
    n_tokens, n_alpha_chars, n_chars_total, n_stopwords(en).
    Vectorized: Arrow regex strip for the alpha count, is_in + bincount
    for stopwords."""
    import pyarrow.compute as pc

    arr = batch[col]
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    arr = pc.fill_null(arr, "")
    flat, doc_idx, counts_all, n = _flat_tokens(batch, col)
    nonempty = pc.utf8_length(flat).to_numpy().astype(np.int64) > 0
    n_tok = np.bincount(doc_idx[nonempty], minlength=n).astype(np.int64)
    n_char = pc.utf8_length(arr).to_numpy().astype(np.int64)
    n_alpha = pc.utf8_length(
        pc.replace_substring_regex(arr, pattern=r"[^\p{L}]", replacement="")
    ).to_numpy().astype(np.int64)
    n_stop = _stopword_hits(flat, doc_idx, n, "en")
    for name, a in [("n_tokens", n_tok), ("n_alpha_chars", n_alpha),
                    ("n_chars_total", n_char), ("n_stopwords_en", n_stop)]:
        batch = batch.append_column(name, pa.array(a))
    return batch


def langid_batch(batch: pa.Table, col: str = "text") -> pa.Table:
    """Stopword-overlap language ID: argmax over per-language stopword hit
    counts, ties broken alphabetically, 'und' (undetermined) when all zero.
    Vectorized: one is_in + bincount per language."""
    flat, doc_idx, _counts, n = _flat_tokens(batch, col)
    hits = np.stack([_stopword_hits(flat, doc_idx, n, lang) for lang in _LANG_ORDER])
    best = np.argmax(hits, axis=0)  # first max wins = alphabetical tie-break
    any_hit = hits.max(axis=0) > 0
    langs = np.asarray(_LANG_ORDER, dtype=object)
    out = np.where(any_hit, langs[best], "und")
    return batch.append_column("lang_pred", pa.array(out.tolist(), type=pa.string()))


_FP_BASE = np.uint64(1099511628211)
_FP_MOD_MASK = np.uint64((1 << 61) - 1)


def _token_hashes(toks: list[str]) -> np.ndarray:
    """Stable 64-bit token hashes (first 8 bytes of md5 — deterministic
    across processes, unlike Python's seeded hash())."""
    out = np.empty(len(toks), dtype=np.uint64)
    for i, t in enumerate(toks):
        out[i] = int.from_bytes(hashlib.md5(t.encode("utf-8")).digest()[:8], "big")
    return out


def rolling_fingerprints(toks: list[str], k: int = 5) -> np.ndarray:
    """Rolling polynomial hash of every k-token window (uint64)."""
    if len(toks) < k:
        return np.empty(0, dtype=np.uint64)
    h = _token_hashes(toks)
    with np.errstate(over="ignore"):  # mod-2^64 wraparound is the hash
        powers = np.empty(k, dtype=np.uint64)
        powers[0] = np.uint64(1)
        for i in range(1, k):
            powers[i] = powers[i - 1] * _FP_BASE
        # windowed dot product mod 2^64 (vectorized via stride tricks)
        windows = np.lib.stride_tricks.sliding_window_view(h, k)
        return (windows * powers[::-1]).sum(axis=1, dtype=np.uint64)


def fingerprint_batch(batch: pa.Table, col: str = "text", k: int = 5) -> pa.Table:
    """Winnowing-style doc fingerprint: min rolling k-gram hash (0 when the
    doc has < k tokens). Content-defined, order-sensitive, deterministic.
    Vectorized: md5 once per UNIQUE token, one global sliding window with
    cross-doc windows masked out, minimum.reduceat per doc."""
    import pyarrow.compute as pc

    flat, doc_idx, _counts, n = _flat_tokens(batch, col)
    nonempty = pc.utf8_length(flat).to_numpy().astype(np.int64) > 0
    denc = flat.dictionary_encode()
    ind = denc.indices.to_numpy().astype(np.int64)
    uniq = denc.dictionary.to_pylist()
    uh = _token_hashes(uniq)  # md5 per unique only
    tok_h = uh[ind][nonempty]
    docs = doc_idx[nonempty]
    fp = np.zeros(n, dtype=np.uint64)
    if tok_h.size >= k:
        with np.errstate(over="ignore"):
            powers = np.empty(k, dtype=np.uint64)
            powers[0] = np.uint64(1)
            for i in range(1, k):
                powers[i] = powers[i - 1] * _FP_BASE
            win = np.lib.stride_tricks.sliding_window_view(tok_h, k)
            h = (win * powers[::-1]).sum(axis=1, dtype=np.uint64)
        same_doc = docs[: docs.size - k + 1] == docs[k - 1:]
        valid = np.flatnonzero(same_doc)
        if valid.size:
            vdocs = docs[valid]
            starts = np.flatnonzero(
                np.concatenate([[True], vdocs[1:] != vdocs[:-1]])
            )
            mins = np.minimum.reduceat(h[valid], starts)
            fp[vdocs[starts]] = mins
    return batch.append_column("fingerprint", pa.array(fp.astype(np.int64)))
