"""Benchmark decontamination (rayfts/ops/decontam.py): known-answer
overlap detection, whole-doc windows for short docs, filter form, and
the benchmark-size guard."""

import numpy as np
import pandas as pd
import pytest


def _ds(texts, ids=None):
    import ray

    return ray.data.from_pandas(pd.DataFrame({
        "doc_id": ids if ids is not None else list(range(len(texts))),
        "text": texts,
    }))


def test_overlap_known_answers(ray_session):
    from rayfts.ops.decontam import decontaminate_stats

    bench = _ds(["the quick brown fox jumps over the lazy dog"])
    corpus = _ds([
        # shares the full 8-gram window(s) with the benchmark
        "prefix words the quick brown fox jumps over the lazy dog suffix",
        # shares tokens but no 8-gram run
        "the quick brown cat sleeps under the lazy sun all day long",
        # completely disjoint
        "numbers one two three four five six seven eight nine ten",
        "",
    ])
    out = (decontaminate_stats(corpus, bench, k=8).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert out["contaminated"].tolist() == [True, False, False, False]
    assert out.loc[0, "n_overlap"] > 0
    assert out.loc[3, "n_shingles"] == 0 and out.loc[3, "n_overlap"] == 0


def test_short_doc_whole_window(ray_session):
    """Docs shorter than k hash as ONE whole-doc window: a 3-token
    benchmark doc contaminates only the exact same 3-token doc."""
    from rayfts.ops.decontam import decontaminate_stats

    bench = _ds(["tiny bench doc"])
    corpus = _ds(["tiny bench doc", "tiny bench", "tiny bench doc extra"])
    out = (decontaminate_stats(corpus, bench, k=8).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    # "tiny bench doc extra" is a 4-token whole-doc window != 3-token one
    assert out["contaminated"].tolist() == [True, False, False]


def test_filter_form_and_determinism(ray_session):
    from rayfts.ops.decontam import decontaminate, decontaminate_stats

    rng = np.random.default_rng(5)
    vocab = [f"w{i}" for i in range(40)]
    texts = [" ".join(rng.choice(vocab, size=12)) for _ in range(60)]
    corpus = _ds(texts)
    bench = _ds(texts[::13])  # every 13th doc is "benchmark"
    stats = (decontaminate_stats(corpus, bench).to_pandas()
             .sort_values("doc_id"))
    kept = sorted(r["doc_id"] for r in
                  decontaminate(corpus, bench).take_all())
    want = stats[~stats["contaminated"]]["doc_id"].tolist()
    assert kept == want
    # the benchmark members themselves are all contaminated
    bench_ids = list(range(0, 60, 13))
    assert stats.set_index("doc_id").loc[bench_ids, "contaminated"].all()


def test_bench_size_guard(ray_session):
    from rayfts.ops.decontam import benchmark_shingles

    big = _ds(["alpha beta gamma delta epsilon zeta eta theta iota kappa"])
    with pytest.raises(ValueError, match="max_bench_shingles"):
        benchmark_shingles(big, max_bench_shingles=1)
