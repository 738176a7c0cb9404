"""Published-recipe corpus preparation — the four round-4 filtering /
selection stages chained the way a real 100-TB training-data run chains
them (Gopher -> RefinedWeb -> GPT-3, then exact dedup):

    Gopher repetition gate      (stateless map_batches filter)
 -> RefinedWeb line dedup       (corpus-wide duplicate-line removal:
                                 pre-aggregated line partials, one
                                 uniform hash reduce, chunked-broadcast
                                 rewrite — text is REWRITTEN here)
 -> GPT-3 decontamination       (k-gram overlap vs a broadcast held-out
                                 set, probed on the REWRITTEN text)
 -> exact dedup                 (min-id per rewritten text: per-batch
                                 combiner + native groupby.min)

This module contributes only the composition; every stage is the
individually oracle-verified operator (``rayfts.ops.repetition``,
``rayfts.ops.linededup``, ``rayfts.ops.decontam``, ``rayfts.ops.dedup``).
Order matters and is the published order: gates run BEFORE any wide edge
so rejected rows never cross a shuffle; line stats are computed over the
GATED corpus (a dropped doc must not vote on which lines are
duplicated); decontamination reads the rewritten text (a removed
boilerplate line cannot contaminate); exact dedup runs LAST because the
rewrite creates new exact duplicates (docs differing only in removed
lines).

Scale shape (100 TB): stages 1 and 3 are stateless vectorized
``map_batches``; stage 2's wide edge carries pre-aggregated (line, occ,
ndocs) partials only; stage 4's wide edge carries (sha, id) pairs only.
No stage materializes corpus-sized data on the driver — the only driver
state is the byte-budgeted duplicate-line chunk stream and the kept-id
array, both with partitioned-join fall-overs.

One composition subtlety: :func:`rayfts.ops.linededup.line_dedup`
CONSUMES its input three times (hash-candidate pass, string-partials
pass, rewrite), and Ray Datasets re-execute their upstream per consume —
so an unmaterialized gate would run 3x. The repetition signals are the
most expensive per-doc kernels in the chain (n-gram lexsorts: ~26x the
line-hash scan on a code corpus), so ``checkpoint_dir`` writes the
GATED corpus once as partitioned parquet and re-reads it per pass —
which is also the resumable stage boundary a 100-TB run wants (crash
after the gate restarts from the checkpoint, not from raw input).
"""

from __future__ import annotations

import glob
import os
import shutil

from rayfts.ops.decontam import decontaminate
from rayfts.ops.dedup import exact_dedup
from rayfts.ops.linededup import line_dedup
from rayfts.ops.repetition import repetition_filter


def prepare_corpus(
    ds,
    bench_ds,
    col: str = "text",
    id_col: str = "doc_id",
    *,
    max_dup_line_frac: float = 0.30,
    max_dup_line_char_frac: float = 0.20,
    max_top_2gram_char_frac: float = 0.20,
    max_dup_5gram_frac: float = 0.15,
    min_docs: int = 2,
    k: int = 8,
    max_bench_shingles: int = 1 << 24,
    checkpoint_dir: str | None = None,
):
    """Corpus Dataset -> prepared Dataset (surviving rows with ``col``
    rewritten and ``n_removed_lines`` appended). ``bench_ds`` is the
    held-out benchmark corpus for decontamination.

    ``checkpoint_dir`` (SHARED storage, like every sink in this package)
    persists the gated corpus once so line_dedup's three passes re-read
    parquet instead of re-running the repetition gate; a complete
    checkpoint (marker present) is reused as-is, a partial one is
    discarded and rewritten."""
    gated = repetition_filter(
        ds, col=col, id_col=id_col,
        max_dup_line_frac=max_dup_line_frac,
        max_dup_line_char_frac=max_dup_line_char_frac,
        max_top_2gram_char_frac=max_top_2gram_char_frac,
        max_dup_5gram_frac=max_dup_5gram_frac,
    )
    if checkpoint_dir is not None:
        import ray.data

        marker = checkpoint_dir.rstrip("/") + ".done"
        files = sorted(glob.glob(os.path.join(checkpoint_dir, "*.parquet")))
        if not (os.path.exists(marker) and files):
            if os.path.exists(marker):
                os.unlink(marker)  # marker without files: stale
            shutil.rmtree(checkpoint_dir, ignore_errors=True)
            os.makedirs(checkpoint_dir, exist_ok=True)
            gated.write_parquet(checkpoint_dir)
            open(marker, "w").close()
            files = sorted(glob.glob(
                os.path.join(checkpoint_dir, "*.parquet")))
        if files:  # an all-gated (empty) corpus writes no files
            gated = ray.data.read_parquet(files)
    rewritten = line_dedup(gated, col=col, id_col=id_col, min_docs=min_docs)
    clean = decontaminate(rewritten, bench_ds, col=col, id_col=id_col,
                          k=k, max_bench_shingles=max_bench_shingles)
    return exact_dedup(clean, col=col, id_col=id_col)
