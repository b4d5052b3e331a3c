"""CLI entry points (the ``ray job submit`` surface).

Mirrors the reference's three executables (indexer.py:167-176,
multithread_indexer.py:228-238, search.py:205-227) as subcommands:

    python -m ics_search_engine_ray build --pages DIR --out DIR [--resume]
    python -m ics_search_engine_ray query --index DIR [--scorer bm25] [--actors N] [QUERY...]
    python -m ics_search_engine_ray serve --index DIR [--port 8080] [--actors N]
    python -m ics_search_engine_ray gen-pages --sf-dir DIR [--replication N]
    python -m ics_search_engine_ray curate --docs PARQUET --out DIR
    python -m ics_search_engine_ray prep --docs PARQUET --out DIR [--budget N]

``build`` is what a cluster job submits (``ray job submit -- python -m
ics_search_engine_ray build ...``); in this sandbox it starts a local Ray.
These CLIs own their Ray session (guarded init + shutdown); library code
never calls ray.init.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def _ray_up(num_cpus):
    import ray
    if not ray.is_initialized():
        kwargs = dict(address="local", include_dashboard=False,
                      ignore_reinit_error=True, logging_level="ERROR")
        if num_cpus:
            kwargs["num_cpus"] = num_cpus
        ray.init(**kwargs)
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False


def cmd_build(args) -> int:
    _ray_up(args.num_cpus)
    import ray
    from ..config import DEFAULT_CONFIG
    from .build import build_index

    cfg = DEFAULT_CONFIG.with_(
        num_index_partitions=args.partitions,
        head_term_salt=args.salt,
        stem=not args.no_stem,
        docid_mode=args.docid_mode,
    )
    res = build_index(args.pages, args.out, cfg, resume=args.resume)
    print(json.dumps({
        "num_docs": res.num_docs, "avgdl": round(res.avgdl, 3),
        "dropped": res.num_dropped, "partitions": res.num_partitions,
        "postings": sum(r["num_postings"] for r in res.manifest),
        "index_bytes": sum(r["seg_bytes"] for r in res.manifest),
        "build_secs": round(res.build_secs, 2),
        "stage_secs": {k: round(v, 2) for k, v in res.stage_secs.items()},
    }))
    ray.shutdown()
    return 0


def cmd_query(args) -> int:
    # federated + actor-pool clients expose only plain .search — reject
    # operator flags BEFORE building any client
    plain_only = args.actors > 0 or "," in args.index
    if plain_only:
        dropped = [f for f in ("explain", "wildcard", "boolean",
                               "proximity", "near")
                   if getattr(args, f, False)]
        if getattr(args, "scorer", "bm25") != "bm25" and "," in args.index:
            dropped.append(f"scorer={args.scorer}")
        if dropped:
            print(f"error: {', '.join('--' + d for d in dropped)} "
                  f"unsupported with a federated/actor-pool index; "
                  f"query a single local index for these", file=sys.stderr)
            return 2
    if args.actors > 0:
        # partition-sharded actor pool (concurrent serving path)
        _ray_up(args.num_cpus)
        from ..query.actors import ShardedSearchIndex
        si = ShardedSearchIndex(args.index, num_actors=args.actors)
    elif "," in args.index:
        # fleet serving: comma-separated index dirs federate with exact
        # global stats (rank-identical to the merged index; see
        # query/federated.py for the disjointness contract)
        from ..query.federated import FederatedSearchIndex
        si = FederatedSearchIndex(args.index.split(","))
    else:
        from ..query.engine import SearchIndex
        si = SearchIndex(args.index)

    def run_one(q: str):
        t0 = time.time()
        if getattr(args, "explain", False) and not plain_only:
            print(json.dumps(si.explain(q, args.k), indent=2))
            return
        if getattr(args, "wildcard", False) and not plain_only:
            results = si.search_prefix(q, args.k)
        elif getattr(args, "boolean", False) and not plain_only:
            results = si.search_boolean(q, args.k)
        elif getattr(args, "proximity", False) and not plain_only:
            results = si.proximity_rerank(q, args.k)
        elif getattr(args, "near", 0) and not plain_only:
            results = si.search_near(q, args.k, window=args.near)
        elif "," in args.index:
            results = si.search(q, args.k, algo=args.algo)
        else:
            results = si.search(q, args.k, scorer=args.scorer,
                                algo=args.algo)
        secs = time.time() - t0
        if not results:
            print("No results found.")
            if not plain_only:        # suggestion cache lives in-process
                sugg = [t for w in q.split()
                        for t, _ in si.suggest(w, n=2)][:5]
                if sugg:
                    print(f"Did you mean: {' / '.join(sugg)}?")
            return
        print(f"Found {len(results)} results:")
        for i, r in enumerate(results, 1):
            head = f"{i}. {r.title} — {r.url}" if r.title else f"{i}. {r.url}"
            print(head)
            print(f"   Score: {r.score:.4f}")
            print(f"   Matched terms: {sorted(r.matched_terms)}")
        print(f"Search completed in {secs:.4f} seconds")

    if args.query:
        run_one(" ".join(args.query))
        return 0
    # REPL, like the reference CLI (search.py:205-227)
    while True:
        try:
            q = input("\nEnter search query (or 'q' to exit): ").strip()
        except EOFError:
            break
        if q.lower() == "q":
            break
        if q:
            run_one(q)
    return 0


def cmd_merge(args) -> int:
    _ray_up(args.num_cpus)
    import ray
    from .merge import merge_indexes

    man = merge_indexes(args.indexes, args.out, near_dedup=not args.no_dedup)
    print(json.dumps({"num_docs": man["num_docs"],
                      "dropped": man["num_dropped"],
                      "postings": sum(r["num_postings"] for r in man["partitions"]),
                      "build_secs": round(man["build_secs"], 2)}))
    ray.shutdown()
    return 0


def cmd_update(args) -> int:
    """Incremental update: index ONLY the new pages (full extract/tokenize/
    dedup on the delta alone), then k-way merge with the existing index —
    global BM25 stats recompute exactly for the union, so the result is
    rank-identical to a scratch rebuild (test_merge_equals_scratch_build)
    at the cost of reindexing just the delta's segments."""
    _ray_up(args.num_cpus)
    import ray
    import shutil
    import tempfile
    from ..config import DEFAULT_CONFIG
    from .build import build_index
    from .merge import merge_indexes

    # the delta MUST be built with the base index's semantics (stem,
    # BM25 params) or merge_indexes rejects the pair after the delta
    # build has already been paid for
    with open(os.path.join(args.index, "manifest.json")) as f:
        base_man = json.load(f)
    cfg = DEFAULT_CONFIG.with_(stem=base_man["stem"],
                               bm25_k1=base_man["bm25_k1"],
                               bm25_b=base_man["bm25_b"])
    delta_dir = tempfile.mkdtemp(prefix="icser_delta_")
    try:
        res = build_index(args.pages, delta_dir, cfg, resume=False)
        man = merge_indexes([args.index, delta_dir], args.out, cfg,
                            near_dedup=not args.no_dedup)
    finally:
        shutil.rmtree(delta_dir, ignore_errors=True)
    print(json.dumps({
        "delta_docs": res.num_docs,
        "num_docs": man["num_docs"],
        "dropped": man["num_dropped"],
        "postings": sum(r["num_postings"] for r in man["partitions"]),
        "build_secs": round(res.build_secs + man["build_secs"], 2)}))
    ray.shutdown()
    return 0


def cmd_verify_index(args) -> int:
    """Index integrity check (fsck): fully decode every segment, recount
    terms/postings against each partition's manifest row, check posting
    doc_ids are strictly ascending, and reconcile docmeta row count with
    the manifest. The operational counterpart of per-partition resume —
    validate a checkpointed/merged/migrated index before serving it.
    No Ray session needed. Exits 1 on any mismatch."""
    import numpy as np
    import pyarrow.parquet as pq
    from ..index.segments import SegmentReader

    with open(os.path.join(args.index, "manifest.json")) as f:
        manifest = json.load(f)
    # salted head terms store the GLOBAL df in every salt partition (the
    # scorer needs it without a cross-partition sum); their per-partition
    # posting count is a shard, so the df==postings invariant applies
    # only to unsalted terms.
    head_df = manifest.get("head_df", {})
    problems = []
    tot_terms = tot_postings = 0
    for row in manifest["partitions"]:
        part = int(row["part"])
        base = os.path.join(args.index, "segments", f"part-{part:05d}")
        r = SegmentReader(base)
        nt = npost = 0
        for t in r.terms():
            tp = r.postings(t, with_positions=True)
            if tp is None:
                problems.append(f"part {part}: term {t!r} undecodable")
                continue
            nt += 1
            npost += int(tp.doc_ids.size)
            if tp.doc_ids.size > 1 and not (np.diff(tp.doc_ids) > 0).all():
                problems.append(
                    f"part {part}: term {t!r} doc_ids not ascending")
            if t in head_df:
                if int(tp.df) != int(head_df[t]):
                    problems.append(
                        f"part {part}: head term {t!r} df {tp.df} != "
                        f"manifest head_df {head_df[t]}")
            elif int(tp.df) != int(tp.doc_ids.size):
                problems.append(
                    f"part {part}: term {t!r} df {tp.df} != "
                    f"{tp.doc_ids.size} postings")
        r.close()
        if nt != int(row["num_terms"]) or npost != int(row["num_postings"]):
            problems.append(
                f"part {part}: decoded {nt} terms/{npost} postings, "
                f"manifest says {row['num_terms']}/{row['num_postings']}")
        tot_terms += nt
        tot_postings += npost
    meta_rows = pq.read_table(os.path.join(args.index, "docmeta"),
                              columns=["doc_id"]).num_rows
    if meta_rows != int(manifest["num_docs"]):
        problems.append(f"docmeta rows {meta_rows} != manifest num_docs "
                        f"{manifest['num_docs']}")
    print(json.dumps({"ok": not problems, "parts": len(manifest["partitions"]),
                      "terms": tot_terms, "postings": tot_postings,
                      "num_docs": meta_rows,
                      "problems": problems[:20]}))
    return 1 if problems else 0


def cmd_vbuild(args) -> int:
    _ray_up(args.num_cpus)
    import ray
    import ray.data as rd
    from .vector import build_vector_index

    embeds = rd.read_parquet(args.embeddings,
                             columns=["vec_id", "embedding"])
    man = build_vector_index(embeds, args.out, n_lists=args.lists,
                             iters=args.iters)
    print(json.dumps(man))
    ray.shutdown()
    return 0


def cmd_vupdate(args) -> int:
    _ray_up(args.num_cpus)
    import ray
    import ray.data as rd
    from .vector import update_vector_index

    embeds = rd.read_parquet(args.embeddings,
                             columns=["vec_id", "embedding"])
    man = update_vector_index(embeds, args.index)
    print(json.dumps(man))
    ray.shutdown()
    return 0


def cmd_vquery(args) -> int:
    # serving path: no Ray session needed (like `query` without --actors)
    from .vector import VectorIndex

    vi = VectorIndex(args.index)
    if args.vec_id is not None:
        # predicate-pushdown scan of the id column only — never the
        # embedding corpus (repo rule: no driver-side O(corpus) state)
        import pyarrow.compute as pc
        import pyarrow.dataset as pds
        dset = pds.dataset([pds.dataset(d, partitioning="hive")
                            for d in vi.gen_dirs])
        t = dset.to_table(filter=pc.field("vec_id") == args.vec_id,
                          columns=["embedding"])
        if t.num_rows == 0:
            print(json.dumps({"error": f"vec_id {args.vec_id} not found"}))
            return 1
        q = t.column("embedding")[0].as_py()
    else:
        q = json.loads(args.vector)
    t0 = time.time()
    res = vi.search(q, k=args.k, n_probe=args.probe)
    secs = time.time() - t0
    print(json.dumps({"results": [{"vec_id": v, "cos": round(c, 6)}
                                  for v, c in res],
                      "secs": round(secs, 5)}))
    return 0


def cmd_migrate(args) -> int:
    _ray_up(args.num_cpus)
    import ray
    from ..config import DEFAULT_CONFIG
    from .migrate import migrate_reference_index

    cfg = DEFAULT_CONFIG.with_(num_index_partitions=args.partitions)
    man = migrate_reference_index(args.src, args.out, cfg)
    print(json.dumps({"num_docs": man["num_docs"],
                      "postings": sum(r["num_postings"] for r in man["partitions"]),
                      "build_secs": round(man["build_secs"], 2)}))
    ray.shutdown()
    return 0


def cmd_serve(args) -> int:
    if args.actors > 0:
        _ray_up(args.num_cpus)
    from .webui import serve

    srv = serve(args.index, port=args.port, actors=args.actors)
    print(f"serving on http://127.0.0.1:{args.port}/ (Ctrl-C to stop)")
    try:
        srv.serve_forever()
    except KeyboardInterrupt:
        srv.shutdown()
    return 0


def cmd_gen_pages(args) -> int:
    _ray_up(args.num_cpus)
    import ray
    from ..sources.pages import generate_pages

    out = generate_pages(args.sf_dir, out_dir=args.out,
                         replication=args.replication, force=args.force)
    print(out)
    ray.shutdown()
    return 0


def cmd_curate(args) -> int:
    _ray_up(args.num_cpus)
    import ray
    from .curate import CurateRules, curate_corpus

    rules = CurateRules(min_words=args.min_words, min_tokens=args.min_tokens,
                        max_digit_ratio=args.max_digit_ratio,
                        max_stopword_ratio=args.max_stopword_ratio)
    res = curate_corpus(args.docs, args.out, rules)
    print(json.dumps(res))
    ray.shutdown()
    return 0


def cmd_prep(args) -> int:
    _ray_up(args.num_cpus)
    import ray
    from .curate import CurateRules, prepare_manifest

    rules = CurateRules(min_words=args.min_words, min_tokens=args.min_tokens,
                        max_digit_ratio=args.max_digit_ratio,
                        max_stopword_ratio=args.max_stopword_ratio)
    res = prepare_manifest(args.docs, args.out, rules, seed=args.seed,
                           budget=args.budget)
    print(json.dumps(res))
    ray.shutdown()
    return 0


def cmd_compact(args) -> int:
    """Rewrite one index without its tombstoned docs (merge of a single
    source, near-dedup off): segments, docmeta and global stats rebuild
    from survivors; the output starts with an empty tombstone set."""
    _ray_up(args.num_cpus)
    import ray
    from .merge import merge_indexes

    man = merge_indexes([args.index], args.out, near_dedup=False)
    print(json.dumps({"num_docs": man["num_docs"],
                      "build_secs": round(man["build_secs"], 2)}))
    ray.shutdown()
    return 0


def cmd_delete(args) -> int:
    """Tombstone documents in a built index (no Ray session needed —
    a docmeta-filtered read + one atomic JSON write). Deleted docs
    vanish from every query path immediately; `merge`/`update` compact
    them out of segments and stats."""
    from ..query.engine import delete_docs

    ids = [int(x) for x in (args.doc_ids or "").split(",") if x]
    urls = [u for u in (args.urls or "").split(",") if u]
    if not ids and not urls:
        print("nothing to delete: pass --doc-ids and/or --urls",
              file=sys.stderr)
        return 2
    total = delete_docs(args.index, doc_ids=ids, urls=urls)
    print(json.dumps({"index": args.index, "tombstones": total}))
    return 0


def _guard_clear_out(out: str, force: bool = False) -> None:
    """Clear ``out`` for a fresh parquet write — but refuse to delete a
    directory that doesn't look like a previous op output (mistyped
    --out pointing at a data/index dir must not be destroyed). Deletes
    when the path is absent, empty, or contains only parquet artifacts
    (*.parquet / *.crc / _SUCCESS / _metadata); anything else needs
    --force."""
    import os
    import shutil
    if not os.path.exists(out):
        return
    if not os.path.isdir(out):
        raise SystemExit(f"--out {out!r} exists and is not a directory")
    if not force:
        def _parquet_ish(name: str) -> bool:
            return (name.endswith(".parquet") or name.endswith(".crc")
                    or name in ("_SUCCESS", "_metadata",
                                "_common_metadata"))
        for root, dirs, files in os.walk(out):
            bad = [f for f in files if not _parquet_ish(f)]
            if bad:
                raise SystemExit(
                    f"--out {out!r} contains non-parquet files "
                    f"(e.g. {bad[0]!r}) — refusing to clear it; pass "
                    f"--force to override")
    shutil.rmtree(out, ignore_errors=True)


def cmd_op(args) -> int:
    """Run any registered pipeline from the __ray_entry__ queries()
    registry over an sf-style table directory; write the result as
    parquet (or print a head). This makes every operator a first-class
    CLI citizen — the registry IS the product surface, not just the
    correctness harness."""
    import importlib.util
    import os as _os

    import pyarrow as _pa

    here = _os.path.dirname(_os.path.dirname(
        _os.path.dirname(_os.path.abspath(__file__))))
    spec = importlib.util.spec_from_file_location(
        "__ray_entry__", _os.path.join(here, "__ray_entry__.py"))
    entry = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(entry)
    registry = entry.queries()
    if args.list or not args.name:
        for name in sorted(registry):
            print(name)
        return 0
    if args.name not in registry:
        print(f"unknown op {args.name!r}; `op --list` shows all "
              f"{len(registry)}", file=sys.stderr)
        return 2
    _ray_up(args.num_cpus)
    import ray

    res = registry[args.name](args.sf_dir)
    if hasattr(res, "iter_batches"):          # Dataset
        if args.out:
            # clear first: Ray write_parquet APPENDS (CLAUDE.md rule) —
            # but a mistyped --out must not nuke an unrelated tree, so
            # only clear what looks like a previous op output
            import shutil
            _guard_clear_out(args.out, force=args.force)
            res = res.materialize()
            res.write_parquet(args.out)
            print(json.dumps({"op": args.name, "out": args.out,
                              "rows": res.count()}))
        else:
            tbl = _pa.concat_tables(
                [b for b in res.iter_batches(batch_format="pyarrow")
                 if b.num_rows] or [_pa.table({})])
            print(tbl.slice(0, args.head).to_pandas().to_string())
            print(json.dumps({"op": args.name, "rows": tbl.num_rows}))
    else:                                      # pa.Table / DataFrame
        tbl = res if isinstance(res, _pa.Table) \
            else _pa.Table.from_pandas(res)
        if args.out:
            import pyarrow.parquet as _pq
            _os.makedirs(args.out, exist_ok=True)
            _pq.write_table(tbl, _os.path.join(args.out, "part-0.parquet"))
            print(json.dumps({"op": args.name, "out": args.out,
                              "rows": tbl.num_rows}))
        else:
            print(tbl.slice(0, args.head).to_pandas().to_string())
            print(json.dumps({"op": args.name, "rows": tbl.num_rows}))
    ray.shutdown()
    return 0


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="ics_search_engine_ray")
    sub = ap.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build", help="build the index from a pages parquet dir")
    b.add_argument("--pages", required=True)
    b.add_argument("--out", required=True)
    b.add_argument("--resume", action="store_true")
    b.add_argument("--partitions", type=int, default=16)
    b.add_argument("--salt", type=int, default=4)
    b.add_argument("--no-stem", action="store_true")
    b.add_argument("--docid-mode", choices=["hash", "dense"], default="hash",
                   help="doc ids: md5(url) hash (default, merge-friendly) "
                        "or dense sorted-url rank (~30%% smaller segments)")
    b.add_argument("--num-cpus", type=int, default=None)
    b.set_defaults(fn=cmd_build)

    q = sub.add_parser("query", help="query an index (REPL if no query given)")
    q.add_argument("--index", required=True)
    q.add_argument("--scorer", choices=["bm25", "tfidf-ref"], default="bm25")
    q.add_argument("--algo", choices=["auto", "taat", "wand", "wand_lazy"],
                   default="auto")
    q.add_argument("-k", type=int, default=10)
    q.add_argument("--actors", type=int, default=0,
                   help="serve through a sharded actor pool of this size")
    q.add_argument("--boolean", action="store_true",
                   help="boolean operators: +word must match, -word must "
                        "not (local path only)")
    q.add_argument("--wildcard", action="store_true",
                   help="treat the query as a vocabulary prefix "
                        "(prefix* expansion, local path only)")
    q.add_argument("--near", type=int, default=0, metavar="W",
                   help="require all query terms within a W-token "
                        "window (local path only)")
    q.add_argument("--explain", action="store_true",
                   help="print the query plan (per-term df/partitions, "
                        "planner choice, tombstones) as JSON")
    q.add_argument("--proximity", action="store_true",
                   help="rerank BM25 finalists by minimal-window "
                        "term proximity (local path only)")
    q.add_argument("--num-cpus", type=int, default=None)
    q.add_argument("query", nargs="*")
    q.set_defaults(fn=cmd_query)

    mg = sub.add_parser("merge", help="merge built indexes (incremental "
                                      "indexing / compaction)")
    mg.add_argument("--out", required=True)
    mg.add_argument("--no-dedup", action="store_true",
                    help="skip cross-corpus near-duplicate removal")
    mg.add_argument("--num-cpus", type=int, default=None)
    mg.add_argument("indexes", nargs="+", help="source index dirs")
    mg.set_defaults(fn=cmd_merge)

    up = sub.add_parser("update", help="incremental update: index new pages "
                                       "and merge into an existing index")
    up.add_argument("--index", required=True, help="existing index dir")
    up.add_argument("--pages", required=True, help="NEW pages parquet dir")
    up.add_argument("--out", required=True)
    up.add_argument("--no-dedup", action="store_true",
                    help="skip cross-corpus near-duplicate removal")
    up.add_argument("--num-cpus", type=int, default=None)
    up.set_defaults(fn=cmd_update)

    vf = sub.add_parser("verify", help="index integrity check (fsck): "
                                       "decode all segments vs manifest")
    vf.add_argument("--index", required=True)
    vf.set_defaults(fn=cmd_verify_index)

    vb = sub.add_parser("vbuild", help="build a persistable IVF vector "
                                       "index from an embeddings parquet")
    vb.add_argument("--embeddings", required=True)
    vb.add_argument("--out", required=True)
    vb.add_argument("--lists", type=int, default=32)
    vb.add_argument("--iters", type=int, default=8)
    vb.add_argument("--num-cpus", type=int, default=None)
    vb.set_defaults(fn=cmd_vbuild)

    vu = sub.add_parser("vupdate", help="append new embeddings to a built "
                                        "vector index (existing centroids)")
    vu.add_argument("--embeddings", required=True)
    vu.add_argument("--index", required=True)
    vu.add_argument("--num-cpus", type=int, default=None)
    vu.set_defaults(fn=cmd_vupdate)

    vq = sub.add_parser("vquery", help="cosine top-k from a built vector "
                                       "index (no Ray session)")
    vq.add_argument("--index", required=True)
    vq.add_argument("--vector", help="JSON float list query vector")
    vq.add_argument("--vec-id", type=int, default=None,
                    help="use this corpus vector as the query")
    vq.add_argument("-k", type=int, default=10)
    vq.add_argument("--probe", type=int, default=8)
    vq.set_defaults(fn=cmd_vquery)

    m = sub.add_parser("migrate", help="convert a reference full_analytics/ "
                                       "JSON index into this engine's format")
    m.add_argument("--src", required=True, help="reference full_analytics dir")
    m.add_argument("--out", required=True)
    m.add_argument("--partitions", type=int, default=16)
    m.add_argument("--num-cpus", type=int, default=None)
    m.set_defaults(fn=cmd_migrate)

    s = sub.add_parser("serve", help="minimal web UI + JSON API over an index")
    s.add_argument("--index", required=True)
    s.add_argument("--port", type=int, default=8080)
    s.add_argument("--actors", type=int, default=0)
    s.add_argument("--num-cpus", type=int, default=None)
    s.set_defaults(fn=cmd_serve)

    g = sub.add_parser("gen-pages", help="generate the synthetic pages corpus")
    g.add_argument("--sf-dir", required=True)
    g.add_argument("--out", default=None)
    g.add_argument("--replication", type=int, default=1)
    g.add_argument("--force", action="store_true")
    g.add_argument("--num-cpus", type=int, default=None)
    g.set_defaults(fn=cmd_gen_pages)

    c = sub.add_parser("curate", help="quality-filter + exact-dedup a "
                                      "documents parquet into a curated corpus")
    c.add_argument("--docs", required=True, help="documents parquet path")
    c.add_argument("--out", required=True)
    c.add_argument("--min-words", type=int, default=20)
    c.add_argument("--min-tokens", type=int, default=15)
    c.add_argument("--max-digit-ratio", type=float, default=0.3)
    c.add_argument("--max-stopword-ratio", type=float, default=0.8)
    c.add_argument("--num-cpus", type=int, default=None)
    c.set_defaults(fn=cmd_curate)

    p = sub.add_parser("prep", help="full training-data prep: quality + "
                       "dedup + decontaminate + split + pack -> manifest "
                       "parquet partitioned by split")
    p.add_argument("--docs", required=True, help="documents parquet path")
    p.add_argument("--out", required=True)
    p.add_argument("--min-words", type=int, default=20)
    p.add_argument("--min-tokens", type=int, default=15)
    p.add_argument("--max-digit-ratio", type=float, default=0.3)
    p.add_argument("--max-stopword-ratio", type=float, default=0.8)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--budget", type=int, default=2048)
    p.add_argument("--num-cpus", type=int, default=None)
    p.set_defaults(fn=cmd_prep)

    cp = sub.add_parser("compact", help="rewrite an index without its "
                        "tombstoned docs (stats rebuild from survivors)")
    cp.add_argument("--index", required=True)
    cp.add_argument("--out", required=True)
    cp.add_argument("--num-cpus", type=int, default=None)
    cp.set_defaults(fn=cmd_compact)

    dl = sub.add_parser("delete", help="tombstone documents in a built "
                        "index (by id and/or url); compacted out at the "
                        "next merge/update")
    dl.add_argument("--index", required=True)
    dl.add_argument("--doc-ids", default="", help="comma-separated ids")
    dl.add_argument("--urls", default="", help="comma-separated urls")
    dl.set_defaults(fn=cmd_delete)

    op = sub.add_parser("op", help="run any registered pipeline "
                        "operator over an sf-style table dir (the "
                        "__ray_entry__ queries() registry); writes "
                        "parquet with --out, prints a head otherwise")
    op.add_argument("name", nargs="?", default=None,
                    help="operator name (see --list)")
    op.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    op.add_argument("--out", default=None,
                    help="output parquet dir (cleared first; refuses "
                         "to clear a dir that doesn't look like a "
                         "previous op output unless --force)")
    op.add_argument("--head", type=int, default=20)
    op.add_argument("--list", action="store_true")
    op.add_argument("--num-cpus", type=int, default=None)
    op.add_argument("--force", action="store_true",
                    help="clear --out even if it contains non-parquet "
                         "files")
    op.set_defaults(fn=cmd_op)

    args = ap.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
