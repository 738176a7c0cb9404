"""Command-line entrypoints — the ``ray job submit`` surface.

The north rule requires builds "submitted via ray job submit on
fixed-size multi-node clusters"; these commands are that job script::

    ray job submit --working-dir . -- \
        python -m rayfts.cli build \
            --input 's3://corpus/part-*.parquet' --index /shared/idx \
            --schema schema.json --content-col content \
            --key-cols repo,path,commit

    python -m rayfts.cli query  --index /shared/idx --query 'match AND struct' --limit 10
    python -m rayfts.cli serve-query --index /shared/idx --query match --actors 8
    python -m rayfts.cli merge  --index /shared/idx --group-size 8
    python -m rayfts.cli info   --index /shared/idx

Only this module (an owned script) calls ``ray.init`` — and only when Ray
is not already initialised (inside ``ray job submit`` the cluster session
exists; standalone it starts a local one). Library code never does
(driver contract, ``__ray_entry__.py``).

Schema files accept BOTH the reference's JSON shape
(``/root/reference/test/lib/fixtures.js:15-48``) and the native terse
shape (see ``rayfts.index.schema``).
"""

from __future__ import annotations

import argparse
import glob
import json
import sys
import time


def _ensure_ray():
    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False


def _load_schema(path_or_json: str):
    from rayfts.index.schema import IndexSchema

    if path_or_json.strip().startswith("["):
        return IndexSchema.from_json(json.loads(path_or_json))
    with open(path_or_json) as f:
        return IndexSchema.from_json(json.load(f))


def cmd_build(args) -> int:
    _ensure_ray()
    from rayfts.index.build import build_index

    paths = sorted(p for pat in args.input for p in glob.glob(pat)) or args.input
    t0 = time.time()
    manifest = build_index(
        paths,
        args.index,
        _load_schema(args.schema),
        index_name=args.name,
        content_col=args.content_col,
        key_cols=args.key_cols.split(",") if args.key_cols else None,
        num_segments=args.num_segments,
        partition_mode=args.partition_mode,
        target_docs_per_segment=args.target_docs_per_segment,
        resume=not args.no_resume,
    )
    dt = time.time() - t0
    print(json.dumps({
        "index": args.index, "segments": len(manifest.segments),
        "docs": manifest.num_docs, "seconds": round(dt, 2),
        "docs_per_sec": round(manifest.num_docs / dt, 1) if dt else None,
    }))
    return 0


def cmd_append(args) -> int:
    """Distributed incremental ingest into an existing index."""
    _ensure_ray()
    from rayfts.index.build import append_to_index

    paths = sorted(p for pat in args.input for p in glob.glob(pat)) or args.input
    t0 = time.time()
    m = append_to_index(paths, args.index, content_col=args.content_col,
                        key_cols=args.key_cols.split(",") if args.key_cols else None,
                        num_new_segments=args.num_new_segments)
    print(json.dumps({"index": args.index, "segments": len(m.segments),
                      "docs": m.num_docs, "version": m.version,
                      "seconds": round(time.time() - t0, 2)}))
    return 0


def cmd_query(args) -> int:
    _ensure_ray()
    from rayfts.query.searcher import Searcher

    s = Searcher(args.index)
    hits = s.query_string(args.query, limit=args.limit,
                          snippet_field=args.snippet_field)
    for h in hits:
        print(json.dumps({"score": round(h["score"], 6), "doc": h["doc"],
                          "snippet": h.get("snippet")}))
    return 0


def cmd_serve_query(args) -> int:
    """One-shot query through the distributed actor-pool path (the serving
    architecture; long-running deployments keep the SearchService alive)."""
    _ensure_ray()
    from rayfts.query.serve import SearchService

    svc = SearchService(args.index, num_actors=args.actors,
                        hot_replicas=getattr(args, "hot_replicas", 0))
    for score, gid, doc in svc.search(args.query, limit=args.limit, fetch=True):
        print(json.dumps({"score": round(score, 6), "docid": int(gid), "doc": doc}))
    svc.shutdown()
    return 0


def cmd_batch_search(args) -> int:
    """Bulk query evaluation: a file of query strings (one per line) or a
    parquet file with a ``query`` column -> top-k per query, written as
    partitioned parquet (resumable consumption) or printed."""
    _ensure_ray()
    import pyarrow as pa

    import ray.data

    from rayfts.query.serve import batch_search

    if args.queries.endswith(".parquet"):
        qds = ray.data.read_parquet(args.queries)
    else:
        with open(args.queries) as f:
            lines = [ln.strip() for ln in f if ln.strip()]
        qds = ray.data.from_arrow(pa.table({"query": pa.array(lines)}))
    out = batch_search(qds, args.index, limit=args.limit)
    if args.out:
        out.write_parquet(args.out)
        print(json.dumps({"out": args.out, "rows": out.count()}))
    else:
        for r in out.take_all():
            print(json.dumps(r))
    return 0


def cmd_merge(args) -> int:
    _ensure_ray()
    from rayfts.index.merge import log_merge_index, merge_index

    t0 = time.time()
    if args.log_policy:
        manifest = log_merge_index(args.index, min_merge=args.min_merge,
                                   max_merge=args.group_size,
                                   num_actors=args.concurrency,
                                   max_passes=args.max_passes)
    else:
        manifest = merge_index(args.index, group_size=args.group_size,
                               num_actors=args.concurrency)
    print(json.dumps({
        "index": args.index, "segments": len(manifest.segments),
        "docs": manifest.num_docs, "seconds": round(time.time() - t0, 2),
    }))
    return 0


def cmd_dedup(args) -> int:
    """Exact-dedup a parquet corpus: write kept ids (or full rows)."""
    _ensure_ray()
    import glob as _glob

    import ray.data

    from rayfts.ops.dedup import exact_dedup, exact_dedup_ids

    paths = sorted(p for pat in args.input for p in _glob.glob(pat)) or args.input
    ds = ray.data.read_parquet(paths)
    if args.full_rows:
        out = exact_dedup(ds, col=args.col, id_col=args.id_col)
    else:
        out = exact_dedup_ids(ds, col=args.col, id_col=args.id_col)
    out.write_parquet(args.out)
    print(json.dumps({"out": args.out, "rows": out.count()}))
    return 0


def cmd_dedup_minhash(args) -> int:
    """MinHash-LSH near-dup pairs of a parquet corpus -> pairs parquet."""
    _ensure_ray()
    import glob as _glob

    import ray.data

    from rayfts.ops.dedup import minhash_dedup_pairs

    paths = sorted(p for pat in args.input for p in _glob.glob(pat)) or args.input
    pairs = minhash_dedup_pairs(
        ray.data.read_parquet(paths), col=args.col, id_col=args.id_col,
        num_perm=args.num_perm, bands=args.bands, k=args.k,
        threshold=args.threshold,
    )
    pairs.write_parquet(args.out)
    print(json.dumps({"out": args.out, "pairs": pairs.count()}))
    return 0


def cmd_clean(args) -> int:
    """Composed corpus clean (gate -> exact dedup -> near-dup drop) ->
    kept (id, lang_pred, n_tokens) parquet."""
    _ensure_ray()
    import glob as _glob

    import ray.data

    from rayfts.ops.clean import clean_corpus

    paths = sorted(p for pat in args.input for p in _glob.glob(pat)) or args.input
    kept = clean_corpus(
        ray.data.read_parquet(paths), col=args.col, id_col=args.id_col,
        langs=tuple(args.langs.split(",")), min_tokens=args.min_tokens,
        alpha_pct=args.alpha_pct, stop_pct=args.stop_pct,
        jaccard_threshold=args.threshold,
    )
    kept.write_parquet(args.out)
    print(json.dumps({"out": args.out, "kept": kept.count()}))
    return 0


def cmd_dup_spans(args) -> int:
    """Exact duplicated-substring spans (or per-doc stats) -> parquet."""
    _ensure_ray()
    import glob as _glob

    import ray.data

    from rayfts.ops.substr import dup_span_stats, duplicated_spans

    paths = sorted(p for pat in args.input for p in _glob.glob(pat)) or args.input
    ds = ray.data.read_parquet(paths)
    if args.stats:
        out = dup_span_stats(ds, col=args.col, id_col=args.id_col,
                             min_len=args.min_len, scope=args.scope)
    else:
        out = duplicated_spans(ds, col=args.col, id_col=args.id_col,
                               min_len=args.min_len, scope=args.scope)
    out.write_parquet(args.out)
    print(json.dumps({"out": args.out, "rows": out.count()}))
    return 0


def cmd_quantiles(args) -> int:
    """Exact distributed quantiles of a numeric column (no sort)."""
    _ensure_ray()
    import glob as _glob

    import ray.data

    from rayfts.ops.quantile import exact_quantiles, grouped_quantiles

    paths = sorted(p for pat in args.input for p in _glob.glob(pat)) or args.input
    ds = ray.data.read_parquet(paths)
    qs = [float(x) for x in args.qs.split(",")]
    if args.by:
        out = grouped_quantiles(ds, args.by, args.col, qs).to_pandas()
        print(out.sort_values([args.by, "q"]).to_json(orient="records"))
    else:
        out = exact_quantiles(ds, args.col, qs)
        print(out.to_pandas().to_json(orient="records"))
    return 0


def cmd_heavy_hitters(args) -> int:
    """Exact frequent tokens (freq >= num/den of all tokens)."""
    _ensure_ray()
    import glob as _glob

    import ray.data

    from rayfts.ops.freq import heavy_hitters

    paths = sorted(p for pat in args.input for p in _glob.glob(pat)) or args.input
    out = heavy_hitters(ray.data.read_parquet(paths), col=args.col,
                        phi_num=args.phi_num, phi_den=args.phi_den)
    print(out.to_pandas().to_json(orient="records"))
    return 0


def cmd_lm_score(args) -> int:
    """Corpus-trained bigram-LM perplexity scores -> parquet."""
    _ensure_ray()
    import glob as _glob

    import ray.data

    from rayfts.ops.lm import bigram_lm_scores

    paths = sorted(p for pat in args.input for p in _glob.glob(pat)) or args.input
    out = bigram_lm_scores(ray.data.read_parquet(paths), col=args.col,
                           id_col=args.id_col, max_vocab=args.max_vocab)
    out.write_parquet(args.out)
    print(json.dumps({"out": args.out, "rows": out.count()}))
    return 0


def cmd_scrub(args) -> int:
    """PII scrub / text normalization -> rewritten parquet."""
    _ensure_ray()
    import glob as _glob

    import ray.data

    from rayfts.ops.scrub import scrub_text

    paths = sorted(p for pat in args.input for p in _glob.glob(pat)) or args.input
    out = scrub_text(ray.data.read_parquet(paths), col=args.col,
                     rules=tuple(args.rules.split(",")))
    out.write_parquet(args.out)
    print(json.dumps({"out": args.out, "rows": out.count()}))
    return 0


def cmd_pack(args) -> int:
    """Concat-then-chunk sequence packing (distributed prefix sum) ->
    (id, n_tokens, pack_id, pack_offset) parquet."""
    _ensure_ray()
    import glob as _glob

    import ray.data

    from rayfts.ops.pack import pack_documents

    paths = sorted(p for pat in args.input for p in _glob.glob(pat)) or args.input
    out = pack_documents(ray.data.read_parquet(paths), col=args.col,
                         id_col=args.id_col, budget=args.budget)
    out.write_parquet(args.out)
    print(json.dumps({"out": args.out, "rows": out.count()}))
    return 0


def cmd_sample(args) -> int:
    """Deterministic hash sample (uniform rate or stratified k-per-group)
    -> parquet."""
    _ensure_ray()
    import glob as _glob

    import ray.data

    from rayfts.ops.sample import (deterministic_sample, stratified_sample_k,
                                   weighted_sample)

    paths = sorted(p for pat in args.input for p in _glob.glob(pat)) or args.input
    ds = ray.data.read_parquet(paths)
    if args.group_col:
        out = stratified_sample_k(ds, args.group_col, args.id_col,
                                  k=args.k, seed=args.seed)
    elif args.weight_col:
        out = weighted_sample(ds, args.weight_col, args.rate_num,
                              args.rate_den, id_col=args.id_col,
                              seed=args.seed)
    else:
        out = deterministic_sample(ds, args.rate_num, args.rate_den,
                                   id_col=args.id_col, seed=args.seed)
    out.write_parquet(args.out)
    print(json.dumps({"out": args.out, "rows": out.count()}))
    return 0


def cmd_ann_build(args) -> int:
    """Build a persisted IVF store (cluster-partitioned parquet + meta)."""
    _ensure_ray()
    import glob as _glob

    import ray.data

    from rayfts.ops.ann import IVFIndex

    paths = sorted(p for pat in args.input for p in _glob.glob(pat)) or args.input
    ivf = IVFIndex(n_clusters=args.clusters, nprobe=args.nprobe).build(
        ray.data.read_parquet(paths), col=args.col, id_col=args.id_col,
        spill_dir=args.store,
    )
    print(json.dumps({"store": ivf.spill_dir, "clusters": args.clusters}))
    return 0


def cmd_ann_search(args) -> int:
    """Bulk ANN: a parquet of (query_id, query vector) rows against a
    persisted IVF store -> top-k parquet (query_id, rank, id, cosine)."""
    _ensure_ray()
    import glob as _glob

    import ray.data

    from rayfts.ops.ann import IVFIndex, ivf_batch_search

    ivf = IVFIndex.load(args.store, nprobe=args.nprobe)
    paths = sorted(p for pat in args.queries for p in _glob.glob(pat)) or args.queries
    out = ivf_batch_search(
        ray.data.read_parquet(paths), ivf, k=args.k,
        query_col=args.query_col, query_id_col=args.query_id_col,
    )
    out.write_parquet(args.out)
    print(json.dumps({"out": args.out, "rows": out.count()}))
    return 0


def cmd_events_window(args) -> int:
    """Tumbling-window aggregate over an event-stream parquet corpus."""
    _ensure_ray()
    import glob as _glob

    import ray.data

    from rayfts.ops.events import tumbling_window_agg

    paths = sorted(p for pat in args.input for p in _glob.glob(pat)) or args.input
    out = tumbling_window_agg(ray.data.read_parquet(paths),
                              window_sec=args.window_sec)
    out.write_parquet(args.out)
    print(json.dumps({"out": args.out, "rows": out.count()}))
    return 0


def cmd_sessionize(args) -> int:
    """Gap-based sessionization over an event-stream parquet corpus."""
    _ensure_ray()
    import glob as _glob

    import ray.data

    from rayfts.ops.events import sessionize

    paths = sorted(p for pat in args.input for p in _glob.glob(pat)) or args.input
    out = sessionize(ray.data.read_parquet(paths), gap_sec=args.gap_sec)
    out.write_parquet(args.out)
    print(json.dumps({"out": args.out, "rows": out.count()}))
    return 0


def cmd_term_stats(args) -> int:
    """Corpus (term, df, cf) table via the salted term shuffle."""
    _ensure_ray()
    import glob as _glob

    import ray.data

    from rayfts.ops.termstats import term_stats_ds

    paths = sorted(p for pat in args.input for p in _glob.glob(pat)) or args.input
    out = term_stats_ds(ray.data.read_parquet(paths), col=args.col,
                        analyzer=args.analyzer, salt_buckets=args.salt_buckets)
    out.write_parquet(args.out)
    print(json.dumps({"out": args.out, "rows": out.count()}))
    return 0


def cmd_postings_export(args) -> int:
    """Term-partitioned global posting lists (groupby-term shuffle)."""
    _ensure_ray()
    import glob as _glob

    import ray.data

    from rayfts.ops.postings_export import build_term_postings

    paths = sorted(p for pat in args.input for p in _glob.glob(pat)) or args.input
    summary = build_term_postings(
        ray.data.read_parquet(paths), args.out, col=args.col,
        id_col=args.id_col, analyzer=args.analyzer, num_buckets=args.buckets,
        resume=args.resume,
    )
    terms = summary["terms"].to_pylist()  # -1 marks a resumed bucket
    print(json.dumps({"out": args.out, "buckets": summary.num_rows,
                      "terms_built": int(sum(t for t in terms if t >= 0)),
                      "buckets_resumed": sum(1 for t in terms if t < 0)}))
    return 0


def _read_inputs(patterns):
    import glob as _glob

    import ray.data

    paths = sorted(p for pat in patterns for p in _glob.glob(pat)) or list(patterns)
    return ray.data.read_parquet(paths)


def cmd_decontaminate(args) -> int:
    """Drop corpus docs sharing a token k-gram with the benchmark set."""
    _ensure_ray()
    from rayfts.ops.decontam import decontaminate

    out = decontaminate(_read_inputs(args.input), _read_inputs(args.bench),
                        col=args.col, id_col=args.id_col, k=args.k)
    out.write_parquet(args.out)
    print(json.dumps({"out": args.out, "rows": out.count()}))
    return 0


def cmd_repetition(args) -> int:
    """Gopher repetition signals (--stats-only) or the composed filter."""
    _ensure_ray()
    from rayfts.ops.repetition import repetition_filter, repetition_stats

    ds = _read_inputs(args.input)
    if args.stats_only:
        out = repetition_stats(ds, col=args.col, id_col=args.id_col)
    else:
        out = repetition_filter(
            ds, col=args.col, id_col=args.id_col,
            max_dup_line_frac=args.max_dup_line_frac,
            max_dup_line_char_frac=args.max_dup_line_char_frac,
            max_top_2gram_char_frac=args.max_top_2gram_char_frac,
            max_dup_5gram_frac=args.max_dup_5gram_frac)
    out.write_parquet(args.out)
    print(json.dumps({"out": args.out, "rows": out.count()}))
    return 0


def cmd_line_dedup(args) -> int:
    """Remove lines duplicated across >= --min-docs documents."""
    _ensure_ray()
    from rayfts.ops.linededup import line_dedup

    out = line_dedup(_read_inputs(args.input), col=args.col,
                     id_col=args.id_col, min_docs=args.min_docs)
    out.write_parquet(args.out)
    print(json.dumps({"out": args.out, "rows": out.count()}))
    return 0


def cmd_prepare(args) -> int:
    """Composed published-recipe preparation: Gopher repetition gate ->
    RefinedWeb line dedup -> GPT-3 decontamination -> exact dedup."""
    _ensure_ray()
    from rayfts.ops.prep import prepare_corpus

    out = prepare_corpus(_read_inputs(args.input), _read_inputs(args.bench),
                         col=args.col, id_col=args.id_col,
                         min_docs=args.min_docs, k=args.k,
                         checkpoint_dir=args.checkpoint_dir)
    out.write_parquet(args.out)
    # count from the written files (metadata-only) -- counting the lazy
    # pipeline would re-execute the whole chain a second time
    import ray.data as _rd
    print(json.dumps({"out": args.out,
                      "rows": _rd.read_parquet(args.out).count()}))
    return 0


def cmd_shuffle_ranks(args) -> int:
    """Seeded deterministic global-shuffle ranks (permutation by
    splitmix64(id ^ seed); reproducible across runs and cluster sizes)."""
    _ensure_ray()
    from rayfts.ops.shuffle import shuffle_ranks

    out = shuffle_ranks(_read_inputs(args.input), id_col=args.id_col,
                        seed=args.seed, chunk_bits=args.chunk_bits)
    out.write_parquet(args.out)
    print(json.dumps({"out": args.out, "rows": out.count()}))
    return 0


def cmd_chunk(args) -> int:
    """Sliding-window codepoint chunking -> (id, chunk_id, start, text)."""
    _ensure_ray()
    from rayfts.ops.chunk import chunk_documents

    out = chunk_documents(_read_inputs(args.input), col=args.col,
                          id_col=args.id_col, chunk_chars=args.chunk_chars,
                          overlap=args.overlap)
    out.write_parquet(args.out)
    print(json.dumps({"out": args.out, "rows": out.count()}))
    return 0


def cmd_dsir(args) -> int:
    """DSIR hashed-ngram importance weights (or top-N selection)."""
    _ensure_ray()
    from rayfts.ops.dsir import dsir_log_weights, dsir_select

    raw = _read_inputs(args.input)
    target = _read_inputs(args.target)
    if args.select:
        out = dsir_select(raw, target, args.select, col=args.col,
                          id_col=args.id_col, num_buckets=args.num_buckets)
    else:
        out = dsir_log_weights(raw, target, col=args.col, id_col=args.id_col,
                               num_buckets=args.num_buckets)
    out.write_parquet(args.out)
    print(json.dumps({"out": args.out, "rows": out.count()}))
    return 0


def cmd_near_dup_clusters(args) -> int:
    """Near-dup connected components (or the kept-id set with --kept)."""
    _ensure_ray()
    from rayfts.ops.cc import near_dup_components, near_dup_kept_ids

    ds = _read_inputs(args.input)
    kw = dict(col=args.col, id_col=args.id_col, k=args.k,
              threshold=args.threshold)
    if args.kept:
        out = near_dup_kept_ids(ds, **kw)
    else:
        out = near_dup_components(ds, method=args.method, **kw)
    out.write_parquet(args.out)
    print(json.dumps({"out": args.out, "rows": out.count()}))
    return 0


def cmd_info(args) -> int:
    from rayfts.index.manifest import build_metrics_summary, read_manifest

    m = read_manifest(args.index)
    print(json.dumps({
        "name": m.name, "version": m.version, "opstamp": m.opstamp,
        "docs": m.num_docs, "build_metrics": build_metrics_summary(m),
        "segments": [
            {"id": s.segment_id, "docs": s.num_docs,
             "lineage": s.lineage, "metrics": s.metrics}
            for s in m.ordered_segments()
        ],
    }, indent=2))
    return 0


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="rayfts")
    sub = ap.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build", help="build or resume an index (ray job entrypoint)")
    b.add_argument("--input", nargs="+", required=True, help="parquet paths/globs")
    b.add_argument("--index", required=True)
    b.add_argument("--schema", required=True, help="schema JSON file or inline JSON")
    b.add_argument("--name", default="index")
    b.add_argument("--content-col", default="content")
    b.add_argument("--key-cols", default=None, help="comma-separated doc-key columns")
    b.add_argument("--num-segments", type=int, default=None)
    b.add_argument("--partition-mode", choices=["input", "hash"], default=None)
    b.add_argument("--target-docs-per-segment", type=int, default=None)
    b.add_argument("--no-resume", action="store_true")
    b.set_defaults(fn=cmd_build)

    app = sub.add_parser("append",
                         help="append new documents to an existing index")
    app.add_argument("--input", nargs="+", required=True)
    app.add_argument("--index", required=True)
    app.add_argument("--content-col", default="content")
    app.add_argument("--key-cols", default=None)
    app.add_argument("--num-new-segments", type=int, default=None)
    app.set_defaults(fn=cmd_append)

    q = sub.add_parser("query", help="string query against an index")
    q.add_argument("--index", required=True)
    q.add_argument("--query", required=True)
    q.add_argument("--limit", type=int, default=10)
    q.add_argument("--snippet-field", default=None)
    q.set_defaults(fn=cmd_query)

    sq = sub.add_parser("serve-query", help="query via the actor-pool service")
    sq.add_argument("--index", required=True)
    sq.add_argument("--query", required=True)
    sq.add_argument("--limit", type=int, default=10)
    sq.add_argument("--actors", type=int, default=4)
    sq.add_argument("--hot-replicas", type=int, default=0,
                    help="hot-term tier size: queries routing cannot "
                         "confine to <= half the shards are answered by "
                         "one cached full-replica evaluation")
    sq.set_defaults(fn=cmd_serve_query)

    bs = sub.add_parser("batch-search", help="bulk query evaluation over a query file")
    bs.add_argument("--index", required=True)
    bs.add_argument("--queries", required=True,
                    help="text file (one query/line) or parquet with a 'query' column")
    bs.add_argument("--limit", type=int, default=10)
    bs.add_argument("--out", default=None, help="write results as parquet here")
    bs.set_defaults(fn=cmd_batch_search)

    m = sub.add_parser("merge", help="merge small segments (actor pool)")
    m.add_argument("--log-policy", action="store_true",
                   help="LogMergePolicy-like tiered compaction (contiguous "
                        "same-level runs) instead of fixed groups")
    m.add_argument("--min-merge", type=int, default=8)
    m.add_argument("--max-passes", type=int, default=8)
    m.add_argument("--index", required=True)
    m.add_argument("--group-size", type=int, default=8)
    m.add_argument("--concurrency", type=int, default=4)
    m.set_defaults(fn=cmd_merge)

    dd = sub.add_parser("dedup-exact", help="exact dedup of a parquet corpus")
    dd.add_argument("--input", nargs="+", required=True)
    dd.add_argument("--col", default="content")
    dd.add_argument("--id-col", default="doc_id")
    dd.add_argument("--out", required=True)
    dd.add_argument("--full-rows", action="store_true")
    dd.set_defaults(fn=cmd_dedup)

    dm = sub.add_parser("dedup-minhash",
                        help="minhash-LSH near-dup pairs of a parquet corpus")
    dm.add_argument("--input", nargs="+", required=True)
    dm.add_argument("--col", default="content")
    dm.add_argument("--id-col", default="doc_id")
    dm.add_argument("--out", required=True)
    dm.add_argument("--num-perm", type=int, default=64)
    dm.add_argument("--bands", type=int, default=16)
    dm.add_argument("--k", type=int, default=3)
    dm.add_argument("--threshold", type=float, default=0.7)
    dm.set_defaults(fn=cmd_dedup_minhash)

    cl = sub.add_parser("clean",
                        help="composed corpus clean: quality/langid gate + "
                             "exact dedup + minhash near-dup drop")
    cl.add_argument("--input", nargs="+", required=True)
    cl.add_argument("--col", default="content")
    cl.add_argument("--id-col", default="doc_id")
    cl.add_argument("--out", required=True)
    cl.add_argument("--langs", default="en")
    cl.add_argument("--min-tokens", type=int, default=20)
    cl.add_argument("--alpha-pct", type=int, default=50)
    cl.add_argument("--stop-pct", type=int, default=5)
    cl.add_argument("--threshold", type=float, default=0.5)
    cl.set_defaults(fn=cmd_clean)

    dsp = sub.add_parser("dup-spans",
                         help="exact duplicated-substring spans / stats")
    dsp.add_argument("--input", nargs="+", required=True)
    dsp.add_argument("--col", default="text")
    dsp.add_argument("--id-col", default="doc_id")
    dsp.add_argument("--min-len", type=int, default=20)
    dsp.add_argument("--scope", choices=["cross_doc", "any"], default="cross_doc")
    dsp.add_argument("--stats", action="store_true",
                     help="per-doc (n_tokens, dup_tokens) instead of spans")
    dsp.add_argument("--out", required=True)
    dsp.set_defaults(fn=cmd_dup_spans)

    qn = sub.add_parser("quantiles",
                        help="exact distributed quantiles (no sort)")
    qn.add_argument("--input", nargs="+", required=True)
    qn.add_argument("--col", default="value")
    qn.add_argument("--qs", default="0.25,0.5,0.75,0.99")
    qn.add_argument("--by", default=None, help="optional group-by key")
    qn.set_defaults(fn=cmd_quantiles)

    hh = sub.add_parser("heavy-hitters",
                        help="exact frequent tokens (two-pass Misra-Gries)")
    hh.add_argument("--input", nargs="+", required=True)
    hh.add_argument("--col", default="text")
    hh.add_argument("--phi-num", type=int, default=1)
    hh.add_argument("--phi-den", type=int, default=200)
    hh.set_defaults(fn=cmd_heavy_hitters)

    lm = sub.add_parser("lm-score",
                        help="bigram-LM perplexity quality scores")
    lm.add_argument("--input", nargs="+", required=True)
    lm.add_argument("--col", default="text")
    lm.add_argument("--id-col", default="doc_id")
    lm.add_argument("--max-vocab", type=int, default=1 << 20)
    lm.add_argument("--out", required=True)
    lm.set_defaults(fn=cmd_lm_score)

    sc = sub.add_parser("scrub",
                        help="PII scrub / text normalization (RE2 rules)")
    sc.add_argument("--input", nargs="+", required=True)
    sc.add_argument("--col", default="text")
    sc.add_argument("--rules", default="email,url,ip")
    sc.add_argument("--out", required=True)
    sc.set_defaults(fn=cmd_scrub)

    pk = sub.add_parser("pack",
                        help="sequence packing via distributed prefix sum")
    pk.add_argument("--input", nargs="+", required=True)
    pk.add_argument("--col", default="text")
    pk.add_argument("--id-col", default="doc_id")
    pk.add_argument("--budget", type=int, default=2048)
    pk.add_argument("--out", required=True)
    pk.set_defaults(fn=cmd_pack)

    sp = sub.add_parser("sample",
                        help="deterministic hash sample (uniform rate, or "
                             "k-per-group with --group-col)")
    sp.add_argument("--input", nargs="+", required=True)
    sp.add_argument("--id-col", default="doc_id")
    sp.add_argument("--out", required=True)
    sp.add_argument("--rate-num", type=int, default=10)
    sp.add_argument("--rate-den", type=int, default=100)
    sp.add_argument("--group-col", default=None)
    sp.add_argument("--weight-col", default=None,
                    help="integer weight column: keep prob = min(1, w*num/den)")
    sp.add_argument("--k", type=int, default=10)
    sp.add_argument("--seed", type=int, default=42)
    sp.set_defaults(fn=cmd_sample)

    ab = sub.add_parser("ann-build",
                        help="build a persisted IVF vector store")
    ab.add_argument("--input", nargs="+", required=True)
    ab.add_argument("--col", default="embedding")
    ab.add_argument("--id-col", default="vec_id")
    ab.add_argument("--store", required=True)
    ab.add_argument("--clusters", type=int, default=16)
    ab.add_argument("--nprobe", type=int, default=4)
    ab.set_defaults(fn=cmd_ann_build)

    asr = sub.add_parser("ann-search",
                         help="bulk top-k against a persisted IVF store")
    asr.add_argument("--store", required=True)
    asr.add_argument("--queries", nargs="+", required=True)
    asr.add_argument("--query-col", default="query")
    asr.add_argument("--query-id-col", default="query_id")
    asr.add_argument("--k", type=int, default=10)
    asr.add_argument("--nprobe", type=int, default=None)
    asr.add_argument("--out", required=True)
    asr.set_defaults(fn=cmd_ann_search)

    ew = sub.add_parser("events-window",
                        help="tumbling-window aggregate over events parquet")
    ew.add_argument("--input", nargs="+", required=True)
    ew.add_argument("--window-sec", type=int, default=3600)
    ew.add_argument("--out", required=True)
    ew.set_defaults(fn=cmd_events_window)

    sz = sub.add_parser("sessionize",
                        help="gap-based sessionization over events parquet")
    sz.add_argument("--input", nargs="+", required=True)
    sz.add_argument("--gap-sec", type=int, default=1800)
    sz.add_argument("--out", required=True)
    sz.set_defaults(fn=cmd_sessionize)

    ts = sub.add_parser("term-stats", help="(term, df, cf) over a corpus")
    ts.add_argument("--input", nargs="+", required=True)
    ts.add_argument("--col", default="content")
    ts.add_argument("--analyzer", default="en_stem")
    ts.add_argument("--salt-buckets", type=int, default=1)
    ts.add_argument("--out", required=True)
    ts.set_defaults(fn=cmd_term_stats)

    pe = sub.add_parser("postings-export",
                        help="term-partitioned global posting lists")
    pe.add_argument("--input", nargs="+", required=True)
    pe.add_argument("--col", default="content")
    pe.add_argument("--id-col", default="doc_id")
    pe.add_argument("--analyzer", default="en_stem")
    pe.add_argument("--buckets", type=int, default=32)
    pe.add_argument("--out", required=True)
    pe.add_argument("--resume", action="store_true",
                    help="skip buckets whose (atomic) files already exist")
    pe.set_defaults(fn=cmd_postings_export)

    dc = sub.add_parser("decontaminate",
                        help="drop docs sharing a token k-gram with a "
                             "benchmark set")
    dc.add_argument("--input", nargs="+", required=True)
    dc.add_argument("--bench", nargs="+", required=True,
                    help="benchmark/held-out parquet (small by definition)")
    dc.add_argument("--col", default="text")
    dc.add_argument("--id-col", default="doc_id")
    dc.add_argument("--k", type=int, default=8)
    dc.add_argument("--out", required=True)
    dc.set_defaults(fn=cmd_decontaminate)

    rp = sub.add_parser("repetition",
                        help="Gopher repetition signals / filter")
    rp.add_argument("--input", nargs="+", required=True)
    rp.add_argument("--col", default="text")
    rp.add_argument("--id-col", default="doc_id")
    rp.add_argument("--stats-only", action="store_true",
                    help="emit the integer signal table instead of filtering")
    rp.add_argument("--max-dup-line-frac", type=float, default=0.30)
    rp.add_argument("--max-dup-line-char-frac", type=float, default=0.20)
    rp.add_argument("--max-top-2gram-char-frac", type=float, default=0.20)
    rp.add_argument("--max-dup-5gram-frac", type=float, default=0.15)
    rp.add_argument("--out", required=True)
    rp.set_defaults(fn=cmd_repetition)

    ld = sub.add_parser("line-dedup",
                        help="remove lines duplicated across documents")
    ld.add_argument("--input", nargs="+", required=True)
    ld.add_argument("--col", default="text")
    ld.add_argument("--id-col", default="doc_id")
    ld.add_argument("--min-docs", type=int, default=2)
    ld.add_argument("--out", required=True)
    ld.set_defaults(fn=cmd_line_dedup)

    pr = sub.add_parser("prepare",
                        help="composed recipe: repetition gate -> line "
                             "dedup -> decontaminate -> exact dedup")
    pr.add_argument("--input", nargs="+", required=True)
    pr.add_argument("--bench", nargs="+", required=True,
                    help="held-out benchmark parquet for decontamination")
    pr.add_argument("--col", default="text")
    pr.add_argument("--id-col", default="doc_id")
    pr.add_argument("--min-docs", type=int, default=2)
    pr.add_argument("--k", type=int, default=8)
    pr.add_argument("--checkpoint-dir", default=None,
                    help="persist the gated corpus once so line dedup's "
                         "three passes skip the repetition gate")
    pr.add_argument("--out", required=True)
    pr.set_defaults(fn=cmd_prepare)

    sr = sub.add_parser("shuffle-ranks",
                        help="seeded deterministic global-shuffle ranks")
    sr.add_argument("--input", nargs="+", required=True)
    sr.add_argument("--id-col", default="doc_id")
    sr.add_argument("--seed", type=int, default=42)
    sr.add_argument("--chunk-bits", type=int, default=None,
                    help="pin chunk granularity (default: auto-size)")
    sr.add_argument("--out", required=True)
    sr.set_defaults(fn=cmd_shuffle_ranks)

    ck = sub.add_parser("chunk",
                        help="sliding-window codepoint chunking")
    ck.add_argument("--input", nargs="+", required=True)
    ck.add_argument("--col", default="text")
    ck.add_argument("--id-col", default="doc_id")
    ck.add_argument("--chunk-chars", type=int, default=2048)
    ck.add_argument("--overlap", type=int, default=256)
    ck.add_argument("--out", required=True)
    ck.set_defaults(fn=cmd_chunk)

    dw = sub.add_parser("dsir",
                        help="DSIR hashed-ngram importance weights / "
                             "top-N selection")
    dw.add_argument("--input", nargs="+", required=True,
                    help="raw corpus parquet")
    dw.add_argument("--target", nargs="+", required=True,
                    help="target-domain parquet")
    dw.add_argument("--col", default="text")
    dw.add_argument("--id-col", default="doc_id")
    dw.add_argument("--num-buckets", type=int, default=10_000)
    dw.add_argument("--select", type=int, default=None,
                    help="emit only the top-N ids by weight")
    dw.add_argument("--out", required=True)
    dw.set_defaults(fn=cmd_dsir)

    nc = sub.add_parser("near-dup-clusters",
                        help="connected-component near-dup clusters "
                             "(or kept ids with --kept)")
    nc.add_argument("--input", nargs="+", required=True)
    nc.add_argument("--col", default="text")
    nc.add_argument("--id-col", default="doc_id")
    nc.add_argument("--k", type=int, default=3)
    nc.add_argument("--threshold", type=float, default=0.5)
    nc.add_argument("--method", default="ngram_jaccard",
                    choices=["ngram_jaccard", "minhash"])
    nc.add_argument("--kept", action="store_true")
    nc.add_argument("--out", required=True)
    nc.set_defaults(fn=cmd_near_dup_clusters)

    i = sub.add_parser("info", help="print manifest (segments, lineage, metrics)")
    i.add_argument("--index", required=True)
    i.set_defaults(fn=cmd_info)

    args = ap.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
