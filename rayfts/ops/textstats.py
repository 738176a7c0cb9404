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
    (whitespace split) and ``n_bpe_tokens`` (BPE-ish pre-tokenizer)."""
    texts = batch[col].to_pylist()
    ws = np.empty(len(texts), dtype=np.int64)
    bpe = np.empty(len(texts), dtype=np.int64)
    for i, t in enumerate(texts):
        t = t or ""
        ws[i] = len(t.split())
        bpe[i] = len(_BPE_RE.findall(t))
    return (batch.append_column("n_ws_tokens", pa.array(ws))
            .append_column("n_bpe_tokens", pa.array(bpe)))


def token_stats_batch(batch: pa.Table, col: str = "text") -> pa.Table:
    """Adds n_tokens, n_types (unique), max_token_len (chars)."""
    texts = batch[col].to_pylist()
    n_tok = np.empty(len(texts), dtype=np.int64)
    n_typ = np.empty(len(texts), dtype=np.int64)
    mx = np.empty(len(texts), dtype=np.int64)
    for i, t in enumerate(texts):
        toks = _tokens(t)
        n_tok[i] = len(toks)
        n_typ[i] = len(set(toks))
        mx[i] = max((len(x) for x in toks), default=0)
    return (
        batch.append_column("n_tokens", pa.array(n_tok))
        .append_column("n_types", pa.array(n_typ))
        .append_column("max_token_len", pa.array(mx))
    )


def quality_stats_batch(batch: pa.Table, col: str = "text") -> pa.Table:
    """Quality signals as exact integers (SQL-oracle friendly):
    n_tokens, n_alpha_chars, n_chars_total, n_stopwords(en)."""
    texts = batch[col].to_pylist()
    n = len(texts)
    n_tok = np.empty(n, dtype=np.int64)
    n_alpha = np.empty(n, dtype=np.int64)
    n_char = np.empty(n, dtype=np.int64)
    n_stop = np.empty(n, dtype=np.int64)
    stop = LANG_STOPWORDS["en"]
    for i, t in enumerate(texts):
        t = t or ""
        toks = _tokens(t)
        n_tok[i] = len(toks)
        n_char[i] = len(t)
        n_alpha[i] = sum(c.isalpha() for c in t)
        n_stop[i] = sum(1 for x in toks if x in stop)
    for name, arr in [("n_tokens", n_tok), ("n_alpha_chars", n_alpha),
                      ("n_chars_total", n_char), ("n_stopwords_en", n_stop)]:
        batch = batch.append_column(name, pa.array(arr))
    return batch


def langid_batch(batch: pa.Table, col: str = "text") -> pa.Table:
    """Stopword-overlap language ID: argmax over per-language stopword hit
    counts, ties broken alphabetically, 'und' (undetermined) when all zero."""
    texts = batch[col].to_pylist()
    out = []
    for t in texts:
        toks = _tokens(t)
        best_lang, best_hits = "und", 0
        for lang in _LANG_ORDER:
            hits = sum(1 for x in toks if x in LANG_STOPWORDS[lang])
            if hits > best_hits:
                best_lang, best_hits = lang, hits
        out.append(best_lang)
    return batch.append_column("lang_pred", pa.array(out, type=pa.string()))


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
    doc has < k tokens). Content-defined, order-sensitive, deterministic."""
    texts = batch[col].to_pylist()
    fp = np.zeros(len(texts), dtype=np.uint64)
    for i, t in enumerate(texts):
        r = rolling_fingerprints(_tokens(t), k)
        if r.size:
            fp[i] = r.min()
    return batch.append_column("fingerprint", pa.array(fp.astype(np.int64)))
