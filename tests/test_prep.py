"""Composed corpus preparation (Gopher gate -> line dedup -> decontam
-> exact dedup): the composition ORDER is the contract under test —
each stage must see the previous stage's output, not the raw corpus."""

import numpy as np
import pyarrow as pa
import pytest
import ray

from rayfts.ops.prep import prepare_corpus


def _filler(seed: int, n: int = 60) -> str:
    """Distinct-word filler long enough that the Gopher gates (tuned
    for real documents) don't trivially reject a short fixture."""
    rng = np.random.default_rng(seed)
    return " ".join(f"w{seed}x{i}v{rng.integers(1000)}" for i in range(n))


def _ds(rows):
    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array([r[0] for r in rows], type=pa.int64()),
        "text": pa.array([r[1] for r in rows], type=pa.string()),
    }))


def _run(ds, bench_rows=(), **kw):
    bench = _ds(list(bench_rows) or [(10_000, "benchmark placeholder")])
    out = prepare_corpus(ds, bench, **kw).take_all()
    return {r["doc_id"]: r for r in out}


def test_gate_survivor_lines_only_vote(ray_session):
    """A line duplicated ONLY via a gate-rejected doc must survive:
    dropped docs do not vote on which lines are cross-doc duplicated."""
    spam = "\n".join(["repeat me"] * 30)  # fails the dup-line gate
    rows = [
        (1, spam + "\nshared line"),
        (2, "shared line\n" + _filler(2)),
        (3, _filler(3)),
    ]
    got = _run(_ds(rows))
    assert 1 not in got  # gated out (Gopher dup-line fraction)
    assert got[2]["text"].startswith("shared line")  # no second voter left
    assert got[2]["n_removed_lines"] == 0


def test_line_dedup_applies_before_decontam(ray_session):
    """A doc contaminated ONLY through a boilerplate line that line
    dedup removes must be KEPT (the probe reads the rewritten text)."""
    boiler = "subscribe to our newsletter today"
    rows = [
        (1, f"{_filler(1)}\n{boiler}"),
        (2, f"{_filler(2)}\n{boiler}"),
    ]
    bench = [(99, boiler)]
    got = _run(_ds(rows), bench_rows=bench, k=8)
    # both docs survive: the contaminating line is duplicated across
    # both docs, so line dedup strips it before the decontamination probe
    assert set(got) == {1, 2}
    for r in got.values():
        assert boiler not in r["text"]
        assert r["n_removed_lines"] == 1


def test_decontam_drops_contaminated_doc(ray_session):
    secret = "the quick brown fox jumps over the lazy dog"
    rows = [
        (1, f"{_filler(1)} {secret} {_filler(11)}"),
        (2, _filler(2)),
    ]
    got = _run(_ds(rows), bench_rows=[(99, secret)], k=8)
    assert set(got) == {2}


def test_exact_dedup_runs_on_rewritten_text(ray_session):
    """Docs 5 and 7 have DIFFERENT original texts (same two lines in
    opposite order); every line is cross-doc duplicated, so the rewrite
    makes both empty — exact dedup must then collapse them to the
    smaller doc_id, proving it runs on the REWRITTEN text (on the
    originals there would be no duplicate to collapse)."""
    a, b = _filler(42), _filler(43)
    rows = [
        (5, f"{a}\n{b}"),
        (7, f"{b}\n{a}"),
        (9, _filler(44)),  # untouched control
    ]
    got = _run(_ds(rows))
    assert set(got) == {5, 9}
    assert got[5]["text"] == ""
    assert got[5]["n_removed_lines"] == 2
    assert got[9]["n_removed_lines"] == 0


def test_pipeline_stays_lazy(ray_session):
    """prepare_corpus returns an unexecuted Dataset (streaming contract:
    consuming it is the caller's choice)."""
    ds = _ds([(i, _filler(i)) for i in range(50)])
    out = prepare_corpus(ds, _ds([(99, _filler(999))]))
    # Ray Datasets expose lazy plans; take(1) must work without error
    assert out.take(1)


def test_checkpoint_dir_same_result_and_reused(ray_session, tmp_path):
    """checkpoint_dir persists the gated corpus: identical output to the
    unmaterialized plan; a complete checkpoint (marker + files) is
    reused as-is; a marker without files is treated as stale."""
    import os

    a, b = _filler(1), _filler(2)
    rows = [(1, f"{a}\nshared line"), (2, f"{b}\nshared line"),
            (3, _filler(3))]
    ck = str(tmp_path / "gated")
    plain = _run(_ds(rows))
    ckpt = _run(_ds(rows), checkpoint_dir=ck)
    assert plain.keys() == ckpt.keys()
    for k in plain:
        assert plain[k]["text"] == ckpt[k]["text"]
    marker = ck + ".done"
    assert os.path.exists(marker)
    files = sorted(os.listdir(ck))
    assert files
    # reuse: second run must not rewrite the checkpoint files
    mtimes = [os.path.getmtime(os.path.join(ck, f)) for f in files]
    again = _run(_ds(rows), checkpoint_dir=ck)
    assert again.keys() == plain.keys()
    assert [os.path.getmtime(os.path.join(ck, f))
            for f in sorted(os.listdir(ck))] == mtimes
    # stale marker (no files) is discarded and the checkpoint rebuilt
    for f in files:
        os.unlink(os.path.join(ck, f))
    rebuilt = _run(_ds(rows), checkpoint_dir=ck)
    assert rebuilt.keys() == plain.keys()
    assert sorted(os.listdir(ck))
