"""Text normalization / PII redaction — the corpus-cleaning stage that
REWRITES text (every other op in this package emits metadata or ids):
redact email addresses, URLs, and IPv4 literals to typed placeholder
tokens and collapse whitespace, with per-doc redaction counts.

Engine-parity design: every pattern is written in the RE2 subset, and
BOTH sides of the correctness gate execute RE2 — Arrow's
``replace_substring_regex``/``count_substring_regex`` here, DuckDB's
``regexp_replace(..., 'g')``/``regexp_extract_all`` in the oracle — so
the rewritten strings match bit-for-bit by construction, not by luck.
Rules apply sequentially (counts are taken on the text as it stands
when the rule runs, mirroring the oracle's CTE chain).

Stateless, vectorized, shuffle-free: one ``map_batches`` pass; at
100 TB this stage is pure streaming compute and belongs BEFORE any
dedup/shuffle stage (smaller, canonical text makes downstream hashes
stable — e.g. two docs differing only in a timestamped URL dedup as
equals after scrubbing).
"""

from __future__ import annotations

import pyarrow as pa

__all__ = ["SCRUB_RULES", "scrub_batch", "scrub_text"]

# (name, RE2 pattern, replacement) — application ORDER is the caller's
# ``rules`` tuple, not this declaration order
SCRUB_RULES: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("url", r"https?://[^\s]+", "<URL>"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
)


def scrub_batch(batch: pa.Table, col: str = "text",
                rules: tuple[str, ...] = ("email", "url", "ip"),
                collapse_ws: bool = True) -> pa.Table:
    """One vectorized pass: returns the batch with ``col`` rewritten and
    an ``n_<rule>`` int64 redaction-count column per active rule."""
    import pyarrow.compute as pc

    arr = batch[col]
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    arr = pc.fill_null(arr, "")
    by_name = {name: (pat, repl) for name, pat, repl in SCRUB_RULES}
    counts = {}
    for name in rules:  # the CALLER's order is the sequential semantics
        pat, repl = by_name[name]
        counts[name] = pc.count_substring_regex(arr, pattern=pat)
        arr = pc.replace_substring_regex(arr, pattern=pat, replacement=repl)
    if collapse_ws:
        arr = pc.utf8_trim_whitespace(
            pc.replace_substring_regex(arr, pattern=r"\s+", replacement=" "))
    out = batch.set_column(batch.column_names.index(col), col, arr)
    for name, c in counts.items():
        out = out.append_column(f"n_{name}", c.cast(pa.int64()))
    return out


def scrub_text(ds, col: str = "text",
               rules: tuple[str, ...] = ("email", "url", "ip"),
               collapse_ws: bool = True):
    """Lazy Dataset with ``col`` scrubbed in place plus per-rule
    redaction counts (see module docstring)."""
    known = {name for name, _, _ in SCRUB_RULES}
    bad = set(rules) - known
    if bad:
        raise ValueError(f"unknown scrub rules {sorted(bad)}; known: {sorted(known)}")
    return ds.map_batches(
        scrub_batch,
        fn_kwargs={"col": col, "rules": tuple(rules), "collapse_ws": collapse_ws},
        batch_format="pyarrow",
    )
