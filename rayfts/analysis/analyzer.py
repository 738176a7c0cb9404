"""Analyzer chains, registered by name — the user-extension surface the
reference exposes through the schema's ``indexing.tokenizer`` field
(``/root/reference/test/lib/fixtures.js:23`` uses ``en_stem`` everywhere).

Chains (tantivy-0.18 semantics, SURVEY.md §8.1):

- ``raw``:      whole field value = one token, no filtering.
- ``default``:  SimpleTokenizer -> RemoveLong(40 bytes) -> LowerCase.
- ``en_stem``:  ``default`` + Snowball English (Porter2) stemming.

SimpleTokenizer: a token is a maximal run of Unicode-alphanumeric
characters (Rust ``char::is_alphanumeric`` = categories L* + Nd/Nl/No),
classified by Arrow's RE2/utf8proc tables on BOTH the row path and the
whole-column path so index-time and query-time analysis agree exactly
(see ``_raw_tokens`` / ``_lower_tokens``). Positions are token ordinals;
filters preserve ordinals. RemoveLong drops tokens whose UTF-8 byte
length is >= 40 (strict ``len < 40`` keeps).

The same chain runs at query time (so ``'mundo'`` matches the stemmed
index of "Ola mundo!" — ``/root/reference/test/basic.js:38-41``).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from rayfts.analysis import porter2

_TOKEN_RE = re.compile(r"[^\W_]+", re.UNICODE)
_REMOVE_LONG_BYTES = 40

# DuckDB/RE2 equivalent of the tokenizer for oracle SQL generation.
TOKEN_RE_SQL = r"[\p{L}\p{N}]+"
_SPLIT_PATTERN = r"[^\p{L}\p{N}]+"


def _lower_tokens(toks: list[str]) -> list[str]:
    """Lowercase with the SAME tables as the column path: ASCII via
    str.lower (identical), anything else via Arrow utf8_lower — Python's
    str.lower disagrees with utf8proc on e.g. 'İ' (adds a combining dot)
    and Greek final sigma, which would break index<->query matching."""
    if all(t.isascii() for t in toks):
        return [t.lower() for t in toks]
    import pyarrow as pa
    import pyarrow.compute as pc

    return pc.utf8_lower(pa.array(toks, type=pa.string())).to_pylist()


def _raw_tokens(text: str) -> list[str]:
    """Canonical tokenization: maximal runs of letters/digits, classified
    by Arrow's RE2/utf8proc tables. The SAME kernel drives the whole-column
    index path (:meth:`Analyzer.analyze_text_column`) and the DuckDB
    oracles, so index-time, query-time and oracle tokenization can never
    diverge on Unicode-version edge cases (Python's ``re`` tables lag a
    version behind and disagree on recently-added codepoints)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    if not text:
        return []
    if text.isascii():  # fast path: tables agree on ASCII
        return _TOKEN_RE.findall(text)
    out = pc.split_pattern_regex(
        pa.array([text], type=pa.string()), pattern=_SPLIT_PATTERN
    )[0].as_py()
    return [t for t in out if t]


@dataclass(frozen=True)
class AnalyzerSpec:
    """Serializable description of a chain (goes into the index manifest)."""

    name: str
    lowercase: bool
    remove_long: int | None
    stemmer: str | None  # None or "english"
    raw: bool = False

    def to_json(self) -> dict:
        return {
            "name": self.name, "lowercase": self.lowercase,
            "remove_long": self.remove_long, "stemmer": self.stemmer,
            "raw": self.raw,
        }

    @staticmethod
    def from_json(d: dict) -> "AnalyzerSpec":
        return AnalyzerSpec(
            name=d["name"], lowercase=d["lowercase"],
            remove_long=d["remove_long"], stemmer=d["stemmer"],
            raw=d.get("raw", False),
        )


_REGISTRY: dict[str, AnalyzerSpec] = {
    "raw": AnalyzerSpec("raw", lowercase=False, remove_long=None, stemmer=None, raw=True),
    "default": AnalyzerSpec("default", lowercase=True, remove_long=_REMOVE_LONG_BYTES, stemmer=None),
    "en_stem": AnalyzerSpec("en_stem", lowercase=True, remove_long=_REMOVE_LONG_BYTES, stemmer="english"),
    "whitespace": AnalyzerSpec("whitespace", lowercase=False, remove_long=None, stemmer=None),
}


def register_analyzer(spec: AnalyzerSpec) -> None:
    """Extension hook mirroring tantivy's analyzer registry."""
    _REGISTRY[spec.name] = spec


def get_spec(name: str) -> AnalyzerSpec:
    try:
        return _REGISTRY[name]
    except KeyError:
        raise KeyError(f"unknown analyzer {name!r}; registered: {sorted(_REGISTRY)}") from None


class Analyzer:
    """Callable chain with a per-instance stem cache.

    One ``Analyzer`` lives per Ray actor / task-worker process (built in
    ``__init__`` of the stage class, not per batch); the stem cache makes
    Porter2 amortized O(1) per token on Zipfian vocabularies.
    """

    # Cap the per-instance stem cache: analyzers live as long as their Ray
    # actor, and one entry per distinct surface token ever seen is a slow
    # OOM on an unbounded stream. Clearing on overflow keeps the Zipf head
    # warm (it re-fills within a batch); a call may overshoot the cap by at
    # most one batch's unique tokens before the next entry check.
    STEM_CACHE_CAP = 1_000_000

    def __init__(self, spec: AnalyzerSpec | str, cache_cap: int | None = None):
        self.spec = get_spec(spec) if isinstance(spec, str) else spec
        self._stem_cache: dict[str, str] = {}
        self._cache_cap = self.STEM_CACHE_CAP if cache_cap is None else cache_cap

    def _stem_cache_checked(self) -> dict[str, str]:
        if len(self._stem_cache) >= self._cache_cap:
            self._stem_cache.clear()
        return self._stem_cache

    def tokens(self, text: str) -> list[str]:
        """Analyzed tokens, position = list index (dropped tokens removed;
        ordinals are post-tokenization, filters keep ordinals — so drops
        DO consume a position, mirrored by returning '' placeholders from
        :meth:`tokens_with_holes` when positions matter)."""
        toks, _ = self.tokens_positions(text)
        return toks

    def tokens_positions(self, text) -> tuple[list[str], list[int]]:
        """(tokens, positions). Positions are token ordinals assigned by the
        tokenizer; the RemoveLong filter removes tokens but preserves the
        ordinals of survivors (tantivy filter semantics).

        A list value is a multi-valued field (the reference flattens array
        values into repeated fields, ``catalog.js:131-144``): each element
        is analyzed in turn and positions continue across elements."""
        if text is None:
            return [], []
        if isinstance(text, (list, tuple)):
            toks: list[str] = []
            poss: list[int] = []
            base = 0
            for el in text:
                t, p = self.tokens_positions(el)
                toks.extend(t)
                poss.extend(base + x for x in p)
                base += self._raw_token_count(el)
            return toks, poss
        spec = self.spec
        if spec.raw:
            return ([text], [0]) if text else ([], [])
        if spec.name == "whitespace":
            raw = text.split()
        else:
            raw = _raw_tokens(text)
        out_toks: list[str] = []
        out_pos: list[int] = []
        cache = self._stem_cache_checked()
        stemming = spec.stemmer is not None
        limit = spec.remove_long
        lowered = _lower_tokens(raw) if spec.lowercase else raw
        for pos, tok in enumerate(raw):
            if limit is not None:
                lc = len(tok)
                # bytes >= chars, and bytes <= 4*chars: only borderline
                # lengths need the actual utf-8 encode (hot-path shortcut)
                if lc >= limit or (lc * 4 >= limit and len(tok.encode("utf-8")) >= limit):
                    continue
            tok = lowered[pos]
            if stemming:
                st = cache.get(tok)
                if st is None:
                    st = porter2.stem(tok)
                    cache[tok] = st
                tok = st
            out_toks.append(tok)
            out_pos.append(pos)
        return out_toks, out_pos

    def tokens_positions_fast(self, text) -> tuple[list[str], list[int] | None]:
        """Hot-path variant for the index build: returns positions=None when
        they are the identity (0..n-1), letting the caller build position
        arrays vectorized. Falls back to :meth:`tokens_positions` whenever a
        token could be dropped (non-ASCII text or a token near the 40-byte
        RemoveLong limit)."""
        spec = self.spec
        if not isinstance(text, str) or spec.raw or spec.name == "whitespace":
            return self.tokens_positions(text)
        raw = _raw_tokens(text)
        if not raw:
            return [], None
        limit = spec.remove_long
        if limit is not None:
            if not text.isascii() or max(map(len, raw)) >= limit:
                return self.tokens_positions(text)
        toks = _lower_tokens(raw) if spec.lowercase else raw
        if spec.stemmer is not None:
            cache = self._stem_cache_checked()
            try:
                toks = [cache[t] for t in toks]
            except KeyError:
                stem = porter2.stem
                for t in set(toks):
                    if t not in cache:
                        cache[t] = stem(t)
                toks = [cache[t] for t in toks]
        return toks, None

    def analyze_text_column(self, arr) -> tuple:
        """Arrow-native whole-column analysis — the index build's hot path.

        Tokenize/filter/lower/stem an entire string column with C++ kernels
        (RE2 split + dictionary_encode) so per-token work happens once per
        UNIQUE surface token instead of once per occurrence. Exactly matches
        :meth:`tokens_positions` on every row (property-tested).

        Returns ``(codes, doc_idx, positions, uniques, counts)``:
        ``codes`` int64 term ordinals into the sorted ``uniques`` vocabulary,
        one entry per surviving token occurrence; ``doc_idx``/``positions``
        parallel arrays (positions are pre-filter tokenizer ordinals);
        ``counts`` = post-filter token count per doc (the fieldnorm input).
        """
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc

        spec = self.spec
        if spec.raw or spec.name == "whitespace":
            raise ValueError("analyze_text_column supports regex-tokenized chains only")
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        arr = pc.fill_null(arr, "")
        n = len(arr)
        sp = pc.split_pattern_regex(arr, pattern=r"[^\p{L}\p{N}]+")
        counts_all = pc.list_value_length(sp).to_numpy().astype(np.int32)
        flat = pc.list_flatten(sp)
        total = len(flat)
        # int32 throughout the token-level arrays: the inversion is memory-
        # bandwidth-bound at full-node concurrency, so halving element width
        # directly buys parallel efficiency (units are <2^31 tokens by plan)
        empty = (np.empty(0, np.int32), np.empty(0, np.int32),
                 np.empty(0, np.int32), np.empty(0, dtype=object),
                 np.zeros(n, np.int64))
        if total == 0:
            return empty
        denc = flat.dictionary_encode()
        ind = denc.indices.to_numpy()
        if ind.dtype != np.int32:
            ind = ind.astype(np.int32)
        uniq = denc.dictionary
        ulen_bytes = pc.binary_length(uniq.cast(pa.binary())).to_numpy()
        uraw = uniq.to_pylist()

        nonempty_u = ulen_bytes > 0
        keep_u = nonempty_u.copy()
        if spec.remove_long is not None:
            keep_u &= ulen_bytes < spec.remove_long
        vals = pc.utf8_lower(uniq).to_pylist() if spec.lowercase else uraw
        if spec.stemmer is not None:
            cache = self._stem_cache_checked()
            stem = porter2.stem
            out = []
            for keep, v in zip(keep_u, vals):
                if not keep:
                    out.append("")
                    continue
                s = cache.get(v)
                if s is None:
                    s = cache[v] = stem(v)
                out.append(s)
            vals = out
        tvals = np.asarray(vals, dtype=object)

        kept_vals = tvals[keep_u]
        if kept_vals.size == 0:
            return empty
        final_uniques, inv = np.unique(kept_vals, return_inverse=True)
        code_of_u = np.full(len(uraw), -1, dtype=np.int32)
        code_of_u[keep_u] = inv.astype(np.int32)
        token_codes = code_of_u[ind]

        doc_idx_all = np.repeat(np.arange(n, dtype=np.int32), counts_all)
        starts = np.concatenate([[0], np.cumsum(counts_all[:-1], dtype=np.int64)])
        m1 = nonempty_u[ind]
        c = np.cumsum(m1, dtype=np.int32)
        base = c[starts] - m1[starts]
        ordinals = (c - 1) - np.repeat(base, counts_all)

        kept = token_codes >= 0
        return (
            token_codes[kept],
            doc_idx_all[kept],
            ordinals[kept],
            final_uniques,
            np.bincount(doc_idx_all[kept], minlength=n).astype(np.int64),
        )

    def _raw_token_count(self, text) -> int:
        """Number of position ordinals one value consumes (pre-filter)."""
        if text is None:
            return 0
        if self.spec.raw:
            return 1 if text else 0
        if self.spec.name == "whitespace":
            return len(text.split())
        return len(_raw_tokens(text))
