"""Composed corpus-cleaning pipeline (rayfts/ops/clean.py).

Covers: the integer-exact quality/langid gate, exact-dup removal, the
pair-minimal near-dup keep rule, and plan parity between the broadcast
semi-difference and the distributed left-outer anti-join drop paths.
"""
import numpy as np
import pyarrow as pa
import pytest

EN = ("the code and the data are in the file with some other words "
      "that make this document long enough to pass the token gate")
EN2 = EN + " plus a tiny suffix"          # near-dup of EN (high jaccard)
FR = ("le code et la donnée sont dans le fichier avec des mots pour "
      "que le document soit assez long et que la langue soit détectée")
SHORT = "the and of it"                    # English but < min_tokens
NOISY = "the and for " + "@#$% " * 60      # stopwords but low alpha ratio


def _ds(rows):
    import ray

    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array([r[0] for r in rows], type=pa.int64()),
        "text": pa.array([r[1] for r in rows], type=pa.string()),
    }))


@pytest.fixture()
def corpus(ray_session):
    # 1=EN, 2=exact dup of 1, 3=near dup of 1, 4=French, 5=short, 6=noisy
    return [(1, EN), (2, EN), (3, EN2), (4, FR), (5, SHORT), (6, NOISY)]


def test_quality_gate_batch(ray_session, corpus):
    from rayfts.ops.clean import quality_gate_batch

    t = pa.table({
        "doc_id": pa.array([r[0] for r in corpus], type=pa.int64()),
        "text": pa.array([r[1] for r in corpus], type=pa.string()),
    })
    out = quality_gate_batch(t, min_tokens=20)
    assert out.column_names == ["doc_id", "text", "lang_pred", "n_tokens"]
    assert out["doc_id"].to_pylist() == [1, 2, 3]   # fr/short/noisy gated out
    assert set(out["lang_pred"].to_pylist()) == {"en"}


def test_clean_corpus_all_stages(ray_session, corpus):
    from rayfts.ops.clean import clean_corpus

    out = clean_corpus(_ds(corpus), min_tokens=20).to_pandas()
    # gate keeps 1,2,3; exact dedup drops 2 (same text, larger id);
    # minhash drops 3 (near-dup of 1, larger id) -> kept = {1}
    assert out.doc_id.tolist() == [1]
    assert out.lang_pred.tolist() == ["en"]


def test_drop_plans_agree(ray_session, corpus):
    """Broadcast semi-difference and the distributed anti-join plan must
    keep identical rows (force the join plan with a zero id budget)."""
    from rayfts.ops.clean import clean_corpus

    base = clean_corpus(_ds(corpus), min_tokens=20).to_pandas()
    joined = clean_corpus(_ds(corpus), min_tokens=20,
                          drop_broadcast_limit=0).to_pandas()
    a = base.sort_values("doc_id").reset_index(drop=True)
    b = joined.sort_values("doc_id").reset_index(drop=True)
    assert a.equals(b[a.columns])


def test_clean_corpus_no_drops(ray_session):
    """Distinct, clean English docs pass through untouched."""
    from rayfts.ops.clean import clean_corpus

    rng = np.random.default_rng(7)
    base_words = EN.split()
    rows = []
    for i in range(8):
        words = list(base_words)
        rng.shuffle(words)
        rows.append((i, " ".join(words) + f" unique{i} marker{i} tail{i}"))
    out = clean_corpus(_ds(rows), min_tokens=20,
                       jaccard_threshold=0.995).to_pandas()
    assert sorted(out.doc_id.tolist()) == list(range(8))


def test_substring_dup_gate_drops_boilerplate_heavy_doc(ray_session):
    """max_dup_permille adds the ExactSubstr gate: a doc that is mostly
    a passage shared with another doc is dropped; lightly-overlapping
    docs survive; default (None) leaves the pipeline unchanged."""
    from rayfts.ops.clean import clean_corpus

    boiler = ("this license header is repeated verbatim across many "
              "files in the repository and it is quite long indeed with "
              "more than enough the tokens to pass the gate")
    uniq = ("the completely original body of the document with the "
            "other words that make it long enough for the token gate "
            "and the quality thresholds to accept it today")
    rows = [
        (1, boiler + " " + uniq),                   # ~50% duplicated
        (2, boiler + " tiny tail the the the the the end of it now with "
            "the more filler words appended to reach the gate length"),
        (3, "the entirely fresh third document the narrative about the "
            "garden the weather the morning walk and the long quiet "
            "afternoon spent reading the interesting new book outside"),
    ]
    strict = clean_corpus(_ds(rows), min_tokens=20, stop_pct=0,
                          alpha_pct=40, jaccard_threshold=0.99,
                          max_dup_permille=300,
                          dup_min_len=8).to_pandas()
    # docs 1 and 2 share the long boilerplate passage (> 30% of each);
    # doc 3 shares nothing long enough
    assert strict.doc_id.tolist() == [3]
    loose = clean_corpus(_ds(rows), min_tokens=20, stop_pct=0,
                         alpha_pct=40, jaccard_threshold=0.99,
                         max_dup_permille=900,
                         dup_min_len=8).to_pandas()
    assert 1 in loose.doc_id.tolist() and 2 in loose.doc_id.tolist()
    off = clean_corpus(_ds(rows), min_tokens=20, stop_pct=0,
                       alpha_pct=40, jaccard_threshold=0.99).to_pandas()
    assert set(off.doc_id) >= {1, 2, 3} - {2}  # only dedup stages apply
