"""Segment merging: actor-pool mergers with deterministic output.

The reference relies on tantivy's background LogMergePolicy and sketches
a controlled-merge design in its header notes (``main.rs:7-17``: copy
to-be-merged segments aside, commit new metas atomically). Here merging
is an explicit, deterministic operation:

- groups are formed over the *ordered* segment list (by segment_id) so
  the merged index preserves global docid order — queries return
  identical (score, docid) before and after a merge;
- each group is merged by one ``MergerActor`` (stateful: term streams of
  every source segment held open) doing a k-way merge of sorted term
  dictionaries with docid rebasing; positions need no re-encode (their
  delta streams are span-local) and are byte-concatenated;
- the merged segment is written tmp+rename and swapped into the manifest
  atomically (originals dropped in the same commit).

Merge determinism (SURVEY.md §5 item 3): same source segments in any
grouping order -> byte-identical merged postings, because inputs are
always processed in segment_id order.
"""

from __future__ import annotations

import json
import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import ray

from rayfts.index import manifest as mf
from rayfts.index.schema import IndexSchema
from rayfts.index.segment import (
    META_FILE,
    NORMS_FILE,
    POSITIONS_FILE,
    POSTINGS_FILE,
    STORE_FILE,
    TERMS_FILE,
    SegmentInfo,
    SegmentReader,
    write_facet_sidecar,
)
from rayfts.codec.postings import encode_postings_batch


def merged_segment_id(source_ids: list[str]) -> str:
    """Sorts into the first source's position (prefix order), keeping
    global docid order intact across the swap."""
    return f"{min(source_ids)}.m{len(source_ids)}"


def _reconcile_store_schemas(stores: list[pa.Table]) -> list[pa.Table]:
    """Text fields are scalar-or-list per doc batch (the multi-valued
    model, catalog.js:131-144), so segments ingested from different batch
    shapes can disagree on a store column's type (string vs
    list<string>), which fails the concat. Promote the SCALAR side of
    drifted columns to single-element lists — doc retrieval already
    normalizes every value to a list (Searcher._fetch_doc), so results
    are unchanged; homogeneous merge groups are untouched."""
    names = {n for t in stores for n in t.column_names}
    drifted = set()
    for name in names:
        types = {t.schema.field(name).type for t in stores
                 if name in t.column_names}
        if len(types) > 1 and any(pa.types.is_list(tp) or
                                  pa.types.is_large_list(tp) for tp in types):
            drifted.add(name)
    if not drifted:
        return stores
    out = []
    for t in stores:
        for name in drifted:
            if name not in t.column_names:
                continue
            i = t.column_names.index(name)
            col = t.column(name).combine_chunks()
            if pa.types.is_list(col.type) or pa.types.is_large_list(col.type):
                continue
            offsets = pa.array(np.arange(len(col) + 1, dtype=np.int32))
            t = t.set_column(i, name, pa.ListArray.from_arrays(offsets, col))
        out.append(t)
    return out


def merge_segment_group(
    index_dir: str, schema_json: list, source_ids: list[str]
) -> SegmentInfo:
    source_ids = sorted(source_ids)
    schema = IndexSchema.from_json(schema_json)
    readers = [SegmentReader(mf.segment_path(index_dir, s), schema) for s in source_ids]
    offsets = np.concatenate([[0], np.cumsum([r.num_docs for r in readers])])[:-1]
    out_id = merged_segment_id(source_ids)
    out_dir = mf.segment_path(index_dir, out_id)
    tmp = out_dir + ".tmp"
    os.makedirs(tmp, exist_ok=True)

    term_rows = {k: [] for k in
                 ["field", "term", "df", "total_tf", "post_off", "post_len",
                  "pos_off", "pos_len"]}
    post_chunks: list[bytes] = []
    pos_chunks: list[bytes] = []
    post_off = 0
    pos_off = 0
    norms_out: dict[str, np.ndarray] = {}
    field_stats: dict[str, dict] = {}

    def _scatter_spans(dst_offs, src_starts, lens):
        """take/put index pair for copying variable-length spans: returns
        (dst_idx, src_idx) flat gather indices (vectorized, no loop)."""
        total = int(lens.sum())
        rel = np.arange(total) - np.repeat(
            np.concatenate([[0], np.cumsum(lens)[:-1]]), lens
        )
        return np.repeat(dst_offs, lens) + rel, np.repeat(src_starts, lens) + rel

    for fdef in schema.indexed_fields:
        dicts = [r.term_dict(fdef.name) for r in readers]
        norms_out[fdef.name] = np.concatenate([r.norms(fdef.name) for r in readers])
        # k-way merge of sorted term arrays (stable: source order within term)
        all_terms = np.concatenate([d["terms"] for d in dicts])
        src_of = np.repeat(np.arange(len(dicts)), [d["terms"].size for d in dicts])
        ord_of = np.concatenate([np.arange(d["terms"].size) for d in dicts]) if all_terms.size else np.empty(0, np.int64)
        order = np.argsort(all_terms, kind="stable")
        s_terms, s_src, s_ord = all_terms[order], src_of[order], ord_of[order]
        codec = readers[0].codec

        if s_terms.size == 0:
            field_stats[fdef.name] = {"total_tokens": 0, "num_terms": 0}
            continue

        # per-span (one span = one term's postings in ONE source) metadata,
        # all aligned with the merge order — everything below is vectorized;
        # a python per-term loop would dominate at 10 sources x 10^5 terms
        df_all = np.concatenate([d["df"].astype(np.int64) for d in dicts])[order]
        span_out_offs = np.concatenate([[0], np.cumsum(df_all)[:-1]])
        total_docs = int(df_all.sum())

        # merged-term grouping over spans
        tchange = np.concatenate([[True], s_terms[1:] != s_terms[:-1]])
        tstart_span = np.flatnonzero(tchange)
        merged_terms = s_terms[tstart_span].tolist()
        t_sizes = np.add.reduceat(df_all, tstart_span)

        # merged docid/tf/norm streams via per-source vectorized scatter
        bulk = [r.all_postings(fdef.name) for r in readers]
        m_docs = np.empty(total_docs, dtype=np.int64)
        m_tfs = np.empty(total_docs, dtype=np.uint32)
        for src in range(len(readers)):
            mask = s_src == src
            if not mask.any():
                continue
            b_docs, b_tfs, b_starts, _b_ends = bulk[src]
            ords = s_ord[mask]
            dst_idx, src_idx = _scatter_spans(
                span_out_offs[mask], b_starts[ords], df_all[mask]
            )
            m_docs[dst_idx] = b_docs[src_idx].astype(np.int64) + offsets[src]
            m_tfs[dst_idx] = b_tfs[src_idx]
        if codec.kind == "tantivy_like":
            m_norms = norms_out[fdef.name][m_docs].astype(np.uint8)
        else:
            m_norms = np.zeros(total_docs, dtype=np.uint8)

        # positions: raw byte-span concatenation (runs are self-delimiting:
        # absolute at run starts), gathered per source in merge order
        if fdef.has_positions:
            plen_all = np.concatenate(
                [d["pos_len"].astype(np.int64) for d in dicts])[order]
            poff_all = np.concatenate(
                [d["pos_off"].astype(np.int64) for d in dicts])[order]
            span_pos_out = np.concatenate([[0], np.cumsum(plen_all)[:-1]])
            total_pos_bytes = int(plen_all.sum())
            pos_stream = np.empty(total_pos_bytes, dtype=np.uint8)
            for src in range(len(readers)):
                mask = s_src == src
                if not mask.any():
                    continue
                dst_idx, src_idx = _scatter_spans(
                    span_pos_out[mask], poff_all[mask], plen_all[mask]
                )
                pos_stream[dst_idx] = np.asarray(readers[src]._positions_buf())[src_idx]
            pos_chunks.append(pos_stream.tobytes())
            term_pos_lens = np.add.reduceat(plen_all, tstart_span)
            term_pos_offs = pos_off + np.concatenate(
                [[0], np.cumsum(term_pos_lens)[:-1]])
            merged_pos = list(zip(term_pos_offs.tolist(), term_pos_lens.tolist()))
            pos_off += total_pos_bytes
        else:
            merged_pos = [(-1, 0)] * len(merged_terms)

        if True:
            p_docs = m_docs.astype(np.uint32)
            p_tfs = m_tfs
            p_norms = m_norms
            ends = np.cumsum(t_sizes)
            starts = ends - np.asarray(t_sizes)
            tf_cum = np.concatenate([[0], np.cumsum(p_tfs.astype(np.int64))])
            blob, t_offs, t_lens = encode_postings_batch(
                p_docs, p_tfs, p_norms, starts, ends
            )
            post_chunks.append(blob)
            term_rows["field"].extend([fdef.name] * len(merged_terms))
            term_rows["term"].extend(merged_terms)
            term_rows["df"].extend(np.asarray(t_sizes).tolist())
            term_rows["total_tf"].extend((tf_cum[ends] - tf_cum[starts]).tolist())
            term_rows["post_off"].extend((t_offs + post_off).tolist())
            term_rows["post_len"].extend(t_lens.tolist())
            term_rows["pos_off"].extend(p for p, _l in merged_pos)
            term_rows["pos_len"].extend(l for _p, l in merged_pos)
            post_off += len(blob)
        field_stats[fdef.name] = {
            "total_tokens": sum(
                r.info.field_stats.get(fdef.name, {}).get("total_tokens", 0)
                for r in readers
            ),
            "num_terms": len(merged_terms),
        }

    terms_table = pa.table({
        "field": pa.array(term_rows["field"], type=pa.string()),
        "term": pa.array(term_rows["term"], type=pa.string()),
        "df": pa.array(term_rows["df"], type=pa.uint32()),
        "total_tf": pa.array(term_rows["total_tf"], type=pa.int64()),
        "post_off": pa.array(term_rows["post_off"], type=pa.int64()),
        "post_len": pa.array(term_rows["post_len"], type=pa.int64()),
        "pos_off": pa.array(term_rows["pos_off"], type=pa.int64()),
        "pos_len": pa.array(term_rows["pos_len"], type=pa.int64()),
    })
    pq.write_table(terms_table, os.path.join(tmp, TERMS_FILE))
    with open(os.path.join(tmp, POSTINGS_FILE), "wb") as f:
        f.write(b"".join(post_chunks))
    with open(os.path.join(tmp, POSITIONS_FILE), "wb") as f:
        f.write(b"".join(pos_chunks))
    np.savez(os.path.join(tmp, NORMS_FILE), **norms_out)
    stores = _reconcile_store_schemas([r.store() for r in readers])
    merged_store = pa.concat_tables(stores, promote_options="default")
    pq.write_table(merged_store, os.path.join(tmp, STORE_FILE))
    # facet sidecars regenerate from the SOURCE sidecars (codes decoded to
    # paths, re-factorized over the union) — not from the merged store,
    # which lacks stored=False facet fields
    facet_cols: dict[str, pa.Array] = {}
    for f in schema.fields:
        if f.type != "facet":
            continue
        vals_parts = []
        try:
            for r in readers:
                codes, paths = r.facet_dict(f.name)
                v = np.empty(codes.size, dtype=object)
                m = codes >= 0
                if m.any():
                    v[m] = paths[codes[m]]
                vals_parts.append(v)
        except KeyError:
            continue  # field absent in the sources
        facet_cols[f.name] = pa.array(np.concatenate(vals_parts))
    write_facet_sidecar(tmp, facet_cols)

    info = SegmentInfo(
        segment_id=out_id,
        num_docs=int(sum(r.num_docs for r in readers)),
        field_stats=field_stats,
        lineage={"merged_from": source_ids},
        metrics={"postings_bytes": post_off, "positions_bytes": pos_off},
        fieldnorm_codec=readers[0].codec.kind,
    )
    with open(os.path.join(tmp, META_FILE), "w") as f:
        json.dump(info.to_json(), f)
    if os.path.isdir(out_dir):
        shutil.rmtree(tmp)
    else:
        os.replace(tmp, out_dir)
    return info


@ray.remote
def _merge_group_task(index_dir: str, schema_json: list, source_ids: list[str]) -> dict:
    # cap Arrow's pools for the merge, then RESTORE: this task runs in a
    # reused worker process that later serves other Ray Data tasks (the
    # actor variant owns its process; a task does not)
    old_cpu, old_io = pa.cpu_count(), pa.io_thread_count()
    try:
        if old_cpu > 2:
            pa.set_cpu_count(2)
            pa.set_io_thread_count(2)
        return merge_segment_group(index_dir, schema_json, source_ids).to_json()
    finally:
        pa.set_cpu_count(old_cpu)
        pa.set_io_thread_count(old_io)


@ray.remote
class MergerActor:
    """Actor-pool merger: one actor merges many groups sequentially,
    amortizing process start; big streaming state stays actor-local."""

    def __init__(self):
        # N merge actors x Arrow's default all-cores thread pool would
        # oversubscribe the node; the merge itself is single-threaded numpy
        if pa.cpu_count() > 2:
            pa.set_cpu_count(2)
            pa.set_io_thread_count(2)

    def merge(self, index_dir: str, schema_json: list, source_ids: list[str]) -> dict:
        return merge_segment_group(index_dir, schema_json, source_ids).to_json()


def merge_index(
    index_dir: str,
    group_size: int = 4,
    num_actors: int = 4,
    delete_sources: bool = True,
) -> mf.Manifest:
    """Compact an index: merge ordered segments in groups of ``group_size``
    using an actor pool, then swap the manifest atomically."""
    manifest = mf.read_manifest(index_dir)
    ordered = manifest.ordered_segments()
    if len(ordered) <= 1:
        return manifest
    groups = [
        [s.segment_id for s in ordered[i : i + group_size]]
        for i in range(0, len(ordered), group_size)
    ]
    schema_json = manifest.schema.to_json()
    actors = [MergerActor.remote() for _ in range(min(num_actors, len(groups)))]
    futs = []
    for gi, group in enumerate(groups):
        if len(group) == 1:
            continue
        futs.append(actors[gi % len(actors)].merge.remote(index_dir, schema_json, group))
    merged_infos = [SegmentInfo.from_json(d) for d in ray.get(futs)]
    for a in actors:
        ray.kill(a)

    merged_source_ids = {sid for g in groups if len(g) > 1 for sid in g}
    keep = [s for s in manifest.segments if s.segment_id not in merged_source_ids]
    new_manifest = mf.Manifest(
        name=manifest.name,
        schema=manifest.schema,
        segments=keep + merged_infos,
        opstamp=manifest.opstamp,
        version=manifest.version + 1,
        # build_params carry the hash-routing / unit-size pins that make
        # resumes cluster-size independent; dropping them here would let a
        # later resume silently re-ingest everything
        build_params=manifest.build_params,
    )
    mf.write_manifest(index_dir, new_manifest)
    if delete_sources:
        for sid in merged_source_ids:
            shutil.rmtree(mf.segment_path(index_dir, sid), ignore_errors=True)
    return new_manifest


# ---------------------------------------------------------------------------
# LogMergePolicy-like auto-merge
# ---------------------------------------------------------------------------


def plan_log_merge_groups(
    ordered_segments, min_merge: int = 8, max_merge: int = 16,
    min_layer_docs: int = 10_000,
) -> list[list[str]]:
    """Tiered merge planning in the spirit of tantivy's LogMergePolicy
    (the reference's intended merge control, ``main.rs:7-17`` design
    notes): segments fall into levels by log2(num_docs) — with everything
    below ``min_layer_docs`` sharing one floor level (tantivy's
    min_layer_size: slightly-unequal small segments must not fragment
    into unmergeable runs) — and a CONTIGUOUS run of >= ``min_merge``
    same-level segments becomes merge groups of up to ``max_merge``.
    Contiguity in the ordered list is required because global docids are
    manifest-ordered — merging a non-contiguous set would renumber
    documents."""
    import math

    floor_lvl = int(math.log2(max(min_layer_docs, 2)))
    runs: list[list[str]] = []
    run: list[str] = []
    run_level = None
    for s in ordered_segments:
        lvl = max(int(math.log2(max(s.num_docs, 1))), floor_lvl)
        if run_level is not None and lvl == run_level:
            run.append(s.segment_id)
        else:
            if run:
                runs.append(run)
            run, run_level = [s.segment_id], lvl
    if run:
        runs.append(run)
    groups = []
    for r in runs:
        if len(r) < min_merge:
            continue
        for i in range(0, len(r), max_merge):
            g = r[i : i + max_merge]
            if len(g) >= 2:
                groups.append(g)
    return groups


def log_merge_index(
    index_dir: str,
    min_merge: int = 8,
    max_merge: int = 16,
    num_actors: int = 4,
    max_passes: int = 8,
) -> mf.Manifest:
    """Compact an index until no level has ``min_merge`` mergeable
    segments (each pass promotes merged segments one level up, so this
    converges like a log-structured merge). Query results are invariant
    across passes (merge preserves global docid order and all stats)."""
    manifest = mf.read_manifest(index_dir)
    for _ in range(max_passes):
        groups = plan_log_merge_groups(
            manifest.ordered_segments(), min_merge, max_merge
        )
        if not groups:
            break
        schema_json = manifest.schema.to_json()
        # remote TASKS, not actors: a one-shot compaction reuses the warm
        # task workers already sitting around from the build, while fresh
        # actor processes would cold-start (~10 s of spawn+imports on the
        # first merge of a session)
        futs = [
            _merge_group_task.remote(index_dir, schema_json, g) for g in groups
        ]
        merged_infos = [SegmentInfo.from_json(d) for d in ray.get(futs)]
        if os.environ.get("RAYFTS_CRASH_BEFORE_MANIFEST_SWAP"):
            # test hook (kill-and-resume coverage): die in the widest
            # crash window — merged segment dirs committed via tmp+rename,
            # manifest NOT yet swapped. A rerun must adopt them.
            import signal

            os.kill(os.getpid(), signal.SIGKILL)
        merged_ids = {sid for g in groups for sid in g}
        keep = [s for s in manifest.segments if s.segment_id not in merged_ids]
        manifest = mf.Manifest(
            name=manifest.name, schema=manifest.schema,
            segments=keep + merged_infos, opstamp=manifest.opstamp,
            version=manifest.version + 1, build_params=manifest.build_params,
        )
        mf.write_manifest(index_dir, manifest)
        for sid in merged_ids:
            shutil.rmtree(mf.segment_path(index_dir, sid), ignore_errors=True)
    return manifest
