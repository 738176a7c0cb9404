"""Gopher-style repetition signals (rayfts/ops/repetition.py):
hand-computed goldens, edge cases (empty/null/whitespace/unicode), the
filter thresholds, and a DuckDB cross-check of the exact-integer
contract on adversarial texts."""

import duckdb
import pandas as pd
import pytest


def _ds(texts, ids=None):
    import ray

    return ray.data.from_pandas(pd.DataFrame({
        "doc_id": ids if ids is not None else list(range(len(texts))),
        "text": texts,
    }))


def _stats(texts):
    from rayfts.ops.repetition import repetition_stats

    return (repetition_stats(_ds(texts)).to_pandas()
            .sort_values("doc_id").reset_index(drop=True))


def test_line_dup_counts(ray_session):
    # 4 non-empty lines after strip; "abc" appears 3x -> 2 dups of 3 chars
    out = _stats(["abc\n  abc \nxy\n\n   \nabc"])
    r = out.iloc[0]
    assert r.n_lines == 4
    assert r.n_dup_lines == 2
    assert r.n_line_chars == 3 * 3 + 2
    assert r.n_dup_line_chars == 6


def test_word_and_2gram_cover(ray_session):
    # words: the cat the cat the -> 5 words, 15 chars
    # 2-grams: (the,cat)x2, (cat,the)x2 -> top count 2, cover 2*6=12
    out = _stats(["The cat, THE cat the."])
    r = out.iloc[0]
    assert r.n_words == 5 and r.n_word_chars == 15
    assert r.top_2gram_count == 2 and r.top_2gram_char_cover == 12
    assert r.n_5grams == 1 and r.n_dup_5grams == 0


def test_5gram_dups(ray_session):
    # "a b c d e" repeated: 10 words -> 6 5-grams, (a b c d e) twice
    # plus 4 distinct bridging grams -> 1 duplicate occurrence
    out = _stats(["a b c d e a b c d e"])
    r = out.iloc[0]
    assert r.n_5grams == 6 and r.n_dup_5grams == 1


def test_empty_null_whitespace(ray_session):
    out = _stats(["", None, "   \n\t\n  "])
    assert (out[[c for c in out.columns if c != "doc_id"]] == 0).all().all()


def test_unicode_codepoint_lengths(ray_session):
    # é words: codepoint lengths, not bytes; digits count as word chars
    out = _stats(["héllo héllo 42"])
    r = out.iloc[0]
    assert r.n_words == 3 and r.n_word_chars == 12
    assert r.top_2gram_count == 1 and r.top_2gram_char_cover == 10


def test_filter_thresholds(ray_session):
    from rayfts.ops.repetition import repetition_filter

    # long enough that no single 2-gram covers 20% of the word chars
    clean = " ".join(f"word{i} tok{i} item{i}" for i in range(40))
    spammy = "\n".join(["buy now cheap pills today"] * 20)
    kept = (repetition_filter(_ds([clean, spammy]))
            .to_pandas()["doc_id"].tolist())
    assert kept == [0]


def test_duckdb_cross_check(ray_session):
    """The Ray op and the driver oracle SQL agree bit-for-bit on
    adversarial inputs (ties, unicode, cr/tab strip, long runs)."""
    import __ray_entry__ as entrymod

    texts = [
        "abc\r\nabc\r\nxyz\t\n\tabc",
        "one two one two one two one two",
        "héllo wörld héllo wörld naïve café",
        "a a a a a a a a a a a a",
        "",
        "single",
        "x y z w v x y z w v x y z w v",
    ]
    df = pd.DataFrame({"doc_id": list(range(len(texts))), "text": texts})
    con = duckdb.connect()
    con.register("documents", df)
    sql = entrymod.oracle_sql()["repetition_stats"]
    want = con.sql(sql).df()
    got = _stats(texts)
    pd.testing.assert_frame_equal(
        got[want.columns.tolist()].astype("int64"),
        want.astype("int64"))
