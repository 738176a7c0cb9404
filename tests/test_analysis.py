"""Tokenizer + Porter2 parity tests (SURVEY.md §5 test plan item 1)."""

from rayfts.analysis.analyzer import Analyzer
from rayfts.analysis.porter2 import stem

# Spec-derived golden pairs (traced by hand against the published
# Snowball english algorithm; see porter2.py docstring).
GOLDEN = {
    "running": "run", "knitting": "knit", "hopping": "hop", "hoping": "hope",
    "flies": "fli", "dies": "die", "ties": "tie", "cries": "cri",
    "caresses": "caress", "ponies": "poni", "cats": "cat",
    "conditional": "condit", "consistency": "consist", "agreed": "agre",
    "national": "nation", "rational": "ration", "generate": "generat",
    "beautiful": "beauti", "beautifully": "beauti", "cycling": "cycl",
    "happiness": "happi", "abruptly": "abrupt",
    # exceptional forms
    "skis": "ski", "skies": "sky", "dying": "die", "lying": "lie",
    "news": "news", "early": "earli", "only": "onli", "proceed": "proceed",
    "inning": "inning",
    # reference-fixture words that must round-trip for the goldens
    "mundo": "mundo", "more": "more", "world": "world", "tell": "tell",
    "hi": "hi", "first": "first",
    # short words untouched
    "a": "a", "ab": "ab", "": "",
}


def test_porter2_golden():
    for w, expect in GOLDEN.items():
        assert stem(w) == expect, f"{w!r}: {stem(w)!r} != {expect!r}"


def test_porter2_idempotent_on_fixture_vocab():
    for w in ["hello", "world", "ola", "mundo", "que", "pasa", "pues",
              "bonjour", "monde", "ciao", "mondo", "second", "tres", "bien"]:
        s = stem(w)
        assert isinstance(s, str) and s


def test_tokenizer_unicode_alnum_runs():
    a = Analyzer("default")
    toks, pos = a.tokens_positions("Hello wörld_9 foo-bar!")
    # underscore and hyphen are separators; unicode letters are token chars
    assert toks == ["hello", "wörld", "9", "foo", "bar"]
    assert pos == [0, 1, 2, 3, 4]


def test_remove_long_boundary_bytes():
    a = Analyzer("default")
    keep39 = "x" * 39
    drop40 = "y" * 40
    # multi-byte: 20 chars x 2 bytes = 40 bytes -> dropped
    drop_mb = "é" * 20
    keep_mb = "é" * 19
    toks, pos = a.tokens_positions(f"{keep39} {drop40} {drop_mb} {keep_mb} end")
    assert keep39 in toks and keep_mb in toks and "end" in toks
    assert drop40 not in toks and drop_mb not in toks
    # dropped tokens still consume a position ordinal
    assert pos == [0, 3, 4]


def test_positions_are_pre_filter_ordinals():
    a = Analyzer("en_stem")
    toks, pos = a.tokens_positions("alpha " + "z" * 50 + " beta")
    assert toks == ["alpha", "beta"]
    assert pos == [0, 2]


def test_raw_analyzer_whole_value():
    a = Analyzer("raw")
    assert a.tokens_positions("Hello World!") == (["Hello World!"], [0])
    assert a.tokens_positions("") == ([], [])
    assert a.tokens_positions(None) == ([], [])


def test_query_and_index_time_chain_agree():
    a = Analyzer("en_stem")
    # 'mundo' query matches indexed 'Ola mundo!' (test/basic.js:38-41)
    assert a.tokens("Ola mundo!")[1] == a.tokens("mundo")[0]


def test_empty_and_separator_only():
    a = Analyzer("en_stem")
    assert a.tokens("") == []
    assert a.tokens("!!! --- ...") == []


def test_stem_cache_consistency():
    a = Analyzer("en_stem")
    first = a.tokens("running running running")
    again = a.tokens("running")
    assert first == ["run", "run", "run"] and again == ["run"]


def test_arrow_column_path_matches_row_path():
    """The Arrow-native whole-column analyzer (build hot path) must produce
    exactly the row-at-a-time chain's (token, position) stream per doc."""
    import numpy as np
    import pyarrow as pa

    docs = [
        "Hello world!", "Ola mundo!", None, "", "!!! --- ;;",
        "héllo_wörld foo-bar", "x" * 45 + " ok short", "a1b2 C3 a1b2",
        "日本語 テスト 123", "  leading and trailing  ",
        "Running RUNS runner", "x" * 39 + " " + "y" * 40,
        "the the the ident42_c7",
        "\u0130stanbul \u03a3\u0399\u0393\u039c\u0391\u03a3",  # utf8proc-vs-python lower() traps
        "\U00031350 new-unicode codepoint",  # added after Python 3.11's tables
    ]
    for name in ["default", "en_stem"]:
        a = Analyzer(name)
        codes, doc_idx, positions, uniques, counts = a.analyze_text_column(
            pa.array(docs, type=pa.large_string())
        )
        b = Analyzer(name)
        for d, text in enumerate(docs):
            toks, poss = b.tokens_positions(text)
            m = doc_idx == d
            got = [(uniques[c], int(p)) for c, p in zip(codes[m], positions[m])]
            assert got == list(zip(toks, poss)), (name, d, text)
            assert counts[d] == len(toks)
        assert list(uniques) == sorted(set(uniques))


def test_arrow_column_path_property_random_unicode():
    """Property: Arrow whole-column analysis == row-at-a-time chain on
    arbitrary unicode (hypothesis)."""
    import pyarrow as pa
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=60, deadline=None)
    @given(st.lists(st.one_of(st.none(), st.text(max_size=60)), max_size=12))
    def check(docs):
        for name in ["default", "en_stem"]:
            a = Analyzer(name)
            codes, doc_idx, positions, uniques, counts = a.analyze_text_column(
                pa.array(docs, type=pa.string())
            )
            b = Analyzer(name)
            for d, text in enumerate(docs):
                toks, poss = b.tokens_positions(text)
                m = doc_idx == d
                got = [(uniques[c], int(p)) for c, p in zip(codes[m], positions[m])]
                assert got == list(zip(toks, poss))
                assert counts[d] == len(toks)

    check()
