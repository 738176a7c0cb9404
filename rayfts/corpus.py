"""Deterministic synthetic source-code corpus (FIXTURES.md family B).

Shape mandated by BASELINE.json input_hint: one Parquet table
(repo, path, commit, lang, content). Generation is seed-fixed,
shard-parallel (one Ray task per shard, rng seeded by (seed, shard)),
and cached on disk — run-to-run byte-stable regardless of parallelism.

Vocabulary: ~50 stop-word-like hot tokens (keywords), 20k mid/low
frequency identifiers under a Zipf(s=1.1) law, plus per-row rare tokens
guaranteeing unique terms. A fixed fraction of rows carries punctuation/
Unicode edge cases (multi-token words, 40+-byte tokens, empty content,
separators only). ``skew=True`` makes ~30% of all occurrences the single
token 'the' (the stop-word-skew bench variant).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import ray

HOT_TOKENS = (
    "the if else return def let const for while in of and or not class fn "
    "func var import from as with try except raise new delete this self "
    "static void int float str bool true false null none break continue "
    "switch case match struct enum impl pub use mod type map"
).split()

LANGS = ["py", "rs", "js", "go", "java", "c"]
NUM_IDENTS = 20_000


def _vocab() -> np.ndarray:
    idents = [f"ident{i}_{'abcdefgh'[i % 8]}{i % 97}" for i in range(NUM_IDENTS)]
    return np.asarray(HOT_TOKENS + idents, dtype=object)


def _zipf_probs(n: int, s: float = 1.1) -> np.ndarray:
    p = 1.0 / np.power(np.arange(1, n + 1, dtype=np.float64), s)
    return p / p.sum()


def generate_shard(
    shard: int, docs_per_shard: int, seed: int = 42, skew: bool = False
) -> pa.Table:
    rng = np.random.default_rng(seed * 1_000_003 + shard)
    vocab = _vocab()
    probs = _zipf_probs(vocab.size)

    lengths = np.clip(
        np.exp(rng.normal(4.6, 0.9, size=docs_per_shard)), 20, 2000
    ).astype(np.int64)
    total = int(lengths.sum())
    toks = rng.choice(vocab, size=total, p=probs)
    if skew:
        hotmask = rng.random(total) < 0.30
        toks[hotmask] = "the"
    # sprinkle rare unique tokens: ~1 per doc on average
    rare_at = rng.choice(total, size=docs_per_shard // 1, replace=False)
    for j, pos in enumerate(rare_at):
        toks[pos] = f"rare{shard}_{j}"

    offs = np.concatenate([[0], np.cumsum(lengths)])
    contents = [" ".join(toks[offs[i]: offs[i + 1]]) for i in range(docs_per_shard)]

    # deterministic edge cases on a fixed fraction of rows
    for i in range(docs_per_shard):
        r = i % 100
        if r == 7:
            contents[i] += " foo-bar"
        elif r == 13:
            contents[i] += " héllo_wörld"
        elif r == 23:
            contents[i] += " " + "x" * 45  # RemoveLong boundary (>=40 bytes)
        elif r == 31:
            contents[i] = ""  # empty content
        elif r == 47:
            contents[i] = "!!! --- ... ;;"  # separators only

    repos = [f"org{int(x) % 23}/project{int(x) % 7}" for x in rng.integers(0, 1000, docs_per_shard)]
    paths = [
        f"src/module{int(a) % 13}/file{shard}_{i}.{LANGS[int(b) % len(LANGS)]}"
        for i, (a, b) in enumerate(zip(rng.integers(0, 999, docs_per_shard),
                                       rng.integers(0, 999, docs_per_shard)))
    ]
    commits = ["".join(f"{b:02x}" for b in rng.integers(0, 256, 20)) for _ in range(docs_per_shard)]
    langs = [p.rsplit(".", 1)[1] for p in paths]
    return pa.table({
        "repo": pa.array(repos, type=pa.string()),
        "path": pa.array(paths, type=pa.string()),
        "commit": pa.array(commits, type=pa.string()),
        "lang": pa.array(langs, type=pa.string()),
        "content": pa.array(contents, type=pa.large_string()),
    })


def generate_corpus(
    out_dir: str,
    num_docs: int,
    seed: int = 42,
    num_shards: int = 16,
    skew: bool = False,
    use_ray: bool = True,
) -> str:
    """Write the corpus as ``out_dir/part-*.parquet`` (one file per shard,
    resumable layout); returns out_dir. Cached: existing complete dirs are
    reused (marker file records the params)."""
    marker = os.path.join(out_dir, "_COMPLETE")
    want = f"{num_docs}|{seed}|{num_shards}|{skew}|v2"
    if os.path.isfile(marker) and open(marker).read() == want:
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    per = (num_docs + num_shards - 1) // num_shards
    counts = [min(per, num_docs - i * per) for i in range(num_shards)]

    if use_ray and ray.is_initialized():
        gen = ray.remote(generate_shard)
        futs = {
            s: gen.remote(s, c, seed, skew) for s, c in enumerate(counts) if c > 0
        }
        for s, fut in futs.items():
            pq.write_table(ray.get(fut), os.path.join(out_dir, f"part-{s:04d}.parquet"),
                           row_group_size=2048)
    else:
        for s, c in enumerate(counts):
            if c > 0:
                pq.write_table(generate_shard(s, c, seed, skew),
                               os.path.join(out_dir, f"part-{s:04d}.parquet"),
                               row_group_size=2048)
    with open(marker, "w") as f:
        f.write(want)
    return out_dir
