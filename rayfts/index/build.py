"""Distributed index build: a resumable Ray Data pipeline.

    read_parquet (pruned columns)
      -> map_batches(prep)            stateless, zero-copy Arrow:
                                      content sha256, doc key, segment hash
      -> [resume filter]              drop rows of already-committed segments
      -> groupby(__seg).map_groups    one group = one segment: deterministic
                                      sort by doc key, vectorized inversion
                                      (factorize + lexsort), atomic
                                      tmp+rename segment write
      -> driver manifest commit       metadata-only, atomic (the reference's
                                      add_segments pattern, SURVEY.md §3.3)

Design notes for cluster scale:

- Segment membership is ``sha256(doc_key) % num_segments`` — deterministic
  under any execution order / parallelism, so docids, BM25 stats and
  ranks are reproducible run-to-run (SURVEY.md §4 "ordering").
- The groupby shuffle is hash-partitioned on ``__seg`` whose values are
  uniform by construction (cryptographic hash of per-doc keys), so the
  build's wide step has NO skew regardless of term distribution; hot
  *terms* never cross the network at all — they are grouped inside each
  segment task by in-memory factorize/lexsort. (The global term-partitioned
  statistics pipeline with explicit hot-term salting lives in
  ``rayfts.ops.termstats``.)
- Resume: committed segments are read from the manifest and their rows
  filtered out right after the read; a killed build therefore redoes only
  uncommitted partitions. Lineage (key-hash domain, row count, content
  checksum) and metrics live on each SegmentInfo.
- Output is one directory per segment — never one giant file.
"""

from __future__ import annotations

import hashlib
import logging
import time

import numpy as np
import pyarrow as pa

import ray
import ray.data

from rayfts.codec.fieldnorm import FieldNormCodec
from rayfts.index import manifest as mf
from rayfts.index.schema import IndexSchema
from rayfts.index.segment import SegmentInfo, build_segment

logger = logging.getLogger(__name__)

SEG_COL = "__seg"
KEY_COL = "__key"
SHA_COL = "content_sha256"


def _sha256_hex(values: list) -> list[str]:
    return [
        hashlib.sha256(("" if v is None else str(v)).encode("utf-8")).hexdigest()
        for v in values
    ]


def _key_hash_u64(keys: list[str]) -> np.ndarray:
    out = np.empty(len(keys), dtype=np.uint64)
    for i, k in enumerate(keys):
        out[i] = int.from_bytes(hashlib.sha256(k.encode("utf-8")).digest()[:8], "big")
    return out


def make_prep_fn(content_col: str, key_cols: list[str] | None, num_segments: int):
    """Stateless map_batches fn: adds content_sha256, __key, __seg."""

    def prep(batch: pa.Table) -> pa.Table:
        if content_col in batch.column_names:
            shas = _sha256_hex(batch[content_col].to_pylist())
        else:
            shas = [""] * batch.num_rows
        if SHA_COL not in batch.column_names:
            batch = batch.append_column(SHA_COL, pa.array(shas, type=pa.string()))
        if key_cols:
            parts = [batch[c].to_pylist() for c in key_cols]
            keys = ["\x1f".join("" if v is None else str(v) for v in row) for row in zip(*parts)]
        else:
            keys = shas
        segs = _key_hash_u64(keys) % np.uint64(num_segments)
        batch = batch.append_column(KEY_COL, pa.array(keys, type=pa.string()))
        batch = batch.append_column(SEG_COL, pa.array(segs.astype(np.int64), type=pa.int64()))
        return batch

    return prep


def segment_name(seg: int, num_segments: int) -> str:
    return f"seg-{int(seg):06d}"


def make_group_builder(
    index_dir: str,
    schema_json: list,
    fieldnorm_codec: str,
    num_segments: int,
    fail_segments: frozenset[int] = frozenset(),
):
    """Per-group segment builder for ``groupby(__seg).map_groups``.

    ``fail_segments`` injects faults for the kill-and-resume test."""

    def build_group(batch: pa.Table) -> pa.Table:
        schema = IndexSchema.from_json(schema_json)
        seg = int(batch[SEG_COL][0].as_py())
        if seg in fail_segments:
            raise RuntimeError(f"injected failure for segment {seg}")
        seg_id = segment_name(seg, num_segments)
        # deterministic local docids: sort by doc key (execution-order free)
        sha_np = np.frombuffer(
            b"".join(bytes.fromhex(s[:16]) for s in batch[SHA_COL].to_pylist()),
            dtype=np.uint64,
        )
        lineage = {
            "seg_mod": seg,
            "num_segments": num_segments,
            "rows": batch.num_rows,
            "content_xor": f"{int(np.bitwise_xor.reduce(sha_np)) if sha_np.size else 0:016x}",
        }
        info = build_segment(
            batch,
            schema,
            seg_id,
            mf.segment_path(index_dir, seg_id),
            fieldnorm_codec=fieldnorm_codec,
            order_by=[KEY_COL],
            lineage=lineage,
        )
        import json as _json

        return pa.table({"info": pa.array([_json.dumps(info.to_json())], type=pa.string())})

    return build_group


def build_index(
    source,
    index_dir: str,
    schema: IndexSchema,
    *,
    index_name: str = "index",
    content_col: str = "content",
    key_cols: list[str] | None = None,
    num_segments: int | None = None,
    fieldnorm_codec: str = FieldNormCodec.TANTIVY_LIKE,
    resume: bool = True,
    columns: list[str] | None = None,
    _fail_segments: frozenset[int] = frozenset(),
) -> mf.Manifest:
    """Build (or resume building) an index from parquet paths or a Dataset.

    Does NOT call ray.init(); Ray Data auto-initializes when standalone and
    the driver/bench own the session (driver contract, __ray_entry__.py).
    """
    t0 = time.time()
    if isinstance(source, (str, list)):
        ds = ray.data.read_parquet(source, columns=columns)
    else:
        ds = source

    if num_segments is None:
        try:
            cpus = int(ray.cluster_resources().get("CPU", 8))
        except Exception:
            cpus = 8
        num_segments = max(2 * cpus, 8)

    # open-or-create, and reconcile build params for resume
    if mf.manifest_exists(index_dir):
        manifest = mf.read_manifest(index_dir)
        adopted = mf.recover_orphan_segments(index_dir, manifest)
        if adopted:
            logger.info("recovered %d orphan segment checkpoints", len(adopted))
        done = {
            s.lineage.get("seg_mod")
            for s in manifest.segments
            if s.lineage.get("num_segments") == num_segments
        }
        if manifest.segments and not resume:
            raise ValueError(f"index at {index_dir} already has segments and resume=False")
        if set(range(num_segments)) <= done:
            logger.info("build_index: all %d segments committed; nothing to do", num_segments)
            return manifest
    else:
        manifest = mf.Manifest(name=index_name, schema=schema)
        mf.write_manifest(index_dir, manifest)
        done = set()

    ds = ds.map_batches(
        make_prep_fn(content_col, key_cols, num_segments),
        batch_format="pyarrow",
    )
    if done:
        done_arr = pa.array(sorted(done), type=pa.int64())

        def drop_done(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            return batch.filter(
                pc.invert(pc.is_in(batch[SEG_COL], value_set=done_arr))
            )

        ds = ds.map_batches(drop_done, batch_format="pyarrow")
        logger.info("resume: skipping %d committed segments", len(done))

    infos_ds = ds.groupby(SEG_COL).map_groups(
        make_group_builder(
            index_dir, schema.to_json(), fieldnorm_codec, num_segments, _fail_segments
        ),
        batch_format="pyarrow",
    )
    # stream segment infos and commit INCREMENTALLY: every completed
    # partition becomes durable as soon as its info arrives, so a crashed
    # driver/build loses only in-flight partitions (checkpoint semantics)
    import json as _json

    new_count = 0
    for batch in infos_ds.iter_batches(batch_size=64, batch_format="pyarrow"):
        infos = [
            SegmentInfo.from_json(_json.loads(s)) for s in batch["info"].to_pylist()
        ]
        manifest = mf.read_manifest(index_dir)
        fresh = sorted(
            (i for i in infos if i.segment_id not in manifest.segment_ids()),
            key=lambda i: i.segment_id,
        )
        if fresh:
            manifest.add_segments(fresh)
            mf.write_manifest(index_dir, manifest)
            new_count += len(fresh)
    manifest = mf.read_manifest(index_dir)
    logger.info(
        "build_index: %d segments (%d new) %d docs in %.1fs",
        len(manifest.segments), new_count, manifest.num_docs, time.time() - t0,
    )
    return manifest
