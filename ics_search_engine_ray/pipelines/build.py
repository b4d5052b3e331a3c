"""End-to-end index build: pages parquet -> compressed segments + docmeta +
link scores, as a resumable Ray Data pipeline (SURVEY.md §3.4).

Stages (each a streaming Dataset transform; no full materialization except
the small driver-side artifacts):

1. read_parquet(pages, columns=[url, html])       — column-pruned read (S1/S2)
2. extract (stateless tasks)                       — M1-M5
3. tokenize+simhash (actor pool)                   — M6-M9, T1, T4
   -> checkpoint: ``docs_tokenized/`` parquet (the resume unit for the
      narrow stages; replaces the reference's partial-index spill S3)
4. simhash LSH dedup                               — T2 (stages/dedup.py)
5. docmeta parquet + global stats (N, avgdl)       — S6, A4
6. head-term df pre-aggregation (combiner + tiny groupby)      — A2 for salted terms
7. doc_terms explode -> term-hash partition assignment (salted for head
   terms) -> groupby(part).map_groups -> write_segment                — A1/A3/O1/S4/S5/S8/S9
   -> per-partition ``.done.json`` manifest = resume + lineage unit
8. link graph -> PageRank/HITS -> link_scores.parquet          — G1/G2/S7
9. ``manifest.json`` with global stats + per-partition metrics

Skew: stopword-class head terms are routed to ``S`` dedicated partitions by
``doc_id % S`` (config ``head_term_salt``); their true df comes from step 6's
pre-aggregated combiner pass, so each salted partition scores with the global
df. Normal terms live wholly inside one hash partition and compute df
locally — no global df table is ever built or broadcast (SURVEY.md §4 skew).
"""

from __future__ import annotations

import hashlib
import json
import os
import time
from dataclasses import dataclass
from typing import Dict, List, Optional, Set

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..config import EngineConfig, DEFAULT_CONFIG, head_terms
from ..index.segments import write_segment
from ..stages.common import filter_dropped_ids as _filter_dropped
from ..stages.doc_terms import explode_doc_terms
from ..stages.dedup import simhash_dedup
from ..stages.extract import extract_dataset
from ..stages.tokenize import tokenize_dataset
from ..graph.linkrank import link_scores_dataset

DOCMETA_COLS = ["doc_id", "url", "title", "simhash", "token_count", "outgoing_links"]


def term_partition(term: str, num_partitions: int) -> int:
    """Stable term-hash partition (md5, not PYTHONHASHSEED-dependent)."""
    return int.from_bytes(hashlib.md5(term.encode("utf-8")).digest()[:8], "big") % num_partitions


@dataclass
class BuildResult:
    index_dir: str
    num_docs: int
    avgdl: float
    num_dropped: int
    num_partitions: int
    manifest: List[dict]
    build_secs: float
    stage_secs: Dict[str, float]


class AssignPartition:
    """Vectorized partition assignment over doc_terms batches."""

    def __init__(self, cfg: EngineConfig, head: frozenset):
        self.cfg = cfg
        self.head = head
        self._memo: Dict[str, int] = {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        P, S = self.cfg.num_index_partitions, self.cfg.head_term_salt
        terms = batch.column("term").combine_chunks()
        enc = pc.dictionary_encode(terms)
        chunk = enc.chunk(0) if isinstance(enc, pa.ChunkedArray) else enc
        codes = chunk.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        vocab = chunk.dictionary.to_pylist()
        uniq_part = np.empty(len(vocab), dtype=np.int64)
        uniq_head = np.zeros(len(vocab), dtype=bool)
        for i, t in enumerate(vocab):
            p = self._memo.get(t)
            if p is None:
                p = term_partition(t, P)
                self._memo[t] = p
            uniq_part[i] = p
            uniq_head[i] = t in self.head
        part = uniq_part[codes]
        if S > 0:
            is_head = uniq_head[codes]
            if is_head.any():
                doc_ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
                part = np.where(is_head, P + (doc_ids % S), part)
        return batch.append_column("part", pa.array(part, pa.int64()))




def _marker_valid(path: str, fingerprint: str) -> bool:
    """A resume marker counts only if the fingerprint it recorded matches the
    current input/config — otherwise a changed input would silently reuse
    stale checkpoints from the same out_dir."""
    try:
        with open(path) as f:
            return f.read().strip() == fingerprint
    except OSError:
        return False


def _read_blocks() -> int:
    """Input block count: ~4 tasks per cluster CPU so the fused
    read->extract->tokenize stage parallelizes past the input file count
    (synthetic corpora land in a handful of parquet files; at real scale the
    file count dominates and this override is a no-op ceiling)."""
    import ray
    try:
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    return max(16, 4 * cpus)


def build_index(pages_path: str, out_dir: str,
                cfg: EngineConfig = DEFAULT_CONFIG,
                resume: bool = False) -> BuildResult:
    """Build (or resume) the full index from a pages parquet directory."""
    import ray.data as rd

    def make_docs():
        pages = rd.read_parquet(pages_path, columns=["url", "html"],
                                override_num_blocks=_read_blocks())
        return extract_dataset(pages, cfg)

    return _build_from_docs(make_docs, pages_path, out_dir, cfg, resume=resume)


def build_index_from_texts(texts_path: str, out_dir: str,
                           cfg: EngineConfig = DEFAULT_CONFIG,
                           resume: bool = False,
                           skip_dedup: bool = True) -> BuildResult:
    """Build an index straight from a keyed text table
    (doc_id:int64, text:string) — no HTML stage, ids preserved.

    Used for oracle-verifiable builds over the testdata ``documents`` table.
    """
    import ray.data as rd
    from ..stages.extract import EXTRACT_SCHEMA

    def make_docs():
        texts = rd.read_parquet(texts_path, columns=["doc_id", "text"],
                                override_num_blocks=_read_blocks())

        def to_docs(b: pa.Table) -> pa.Table:
            n = b.num_rows
            ids = b.column("doc_id")
            return pa.table({
                "doc_id": ids,
                "url": pa.array([f"doc://{d}" for d in ids.to_pylist()], pa.string()),
                "text": b.column("text").cast(pa.string()),
                "title": pa.array([""] * n, pa.string()),
                "wt_texts": pa.array([[]] * n, pa.list_(pa.string())),
                "wt_weights": pa.array([[]] * n, pa.list_(pa.float32())),
                "outgoing_links": pa.array([[]] * n, pa.list_(pa.string())),
            })

        return texts.map_batches(to_docs, batch_format="pyarrow")

    return _build_from_docs(make_docs, texts_path, out_dir, cfg, resume=resume,
                            skip_dedup=skip_dedup)


def _build_from_docs(make_docs, input_path: str, out_dir: str,
                     cfg: EngineConfig = DEFAULT_CONFIG,
                     resume: bool = False,
                     skip_dedup: bool = False) -> BuildResult:
    import ray
    import ray.data as rd

    t_start = time.time()
    stage_secs: Dict[str, float] = {}
    os.makedirs(out_dir, exist_ok=True)
    seg_dir = os.path.join(out_dir, "segments")
    fingerprint = hashlib.md5(
        f"{os.path.abspath(input_path)}|{cfg.num_index_partitions}|{cfg.head_term_salt}|"
        f"{cfg.bm25_k1}|{cfg.bm25_b}|{cfg.stem}|{skip_dedup}|"
        f"{cfg.dynamic_salt_df_frac}|{cfg.docid_mode}|v5".encode()).hexdigest()[:16]
    # (v2: Porter stemmer moved to NLTK_EXTENSIONS; v3: blocked segment
    # layout with per-block delta resets + block byte offsets; v4:
    # conservative round-up f32 block maxima; v5: docid_mode joins the
    # fingerprint — a mode flip MUST invalidate every cached stage)

    # ---- 1-3: extract + tokenize checkpoint ----
    # The tokenized relation is materialized ONCE into the object store and
    # feeds every downstream stage (dedup / docmeta / head_df / segments) —
    # no repeated parquet re-parse. The parquet checkpoint is the resume
    # unit; at scale the object store spills materialized blocks to disk
    # under memory pressure, which is exactly the checkpoint's cost profile.
    t0 = time.time()
    tok_dir = os.path.join(out_dir, "docs_tokenized")
    tok_marker = os.path.join(tok_dir, "_SUCCESS")
    if resume and _marker_valid(tok_marker, fingerprint):
        tok_mat = rd.read_parquet(tok_dir).materialize()
    else:
        tok_mat = tokenize_dataset(make_docs(), cfg).materialize()
        # clear any stale checkpoint first: Ray's write_parquet APPENDS
        # uniquely-named files, so rewriting after a fingerprint change
        # would otherwise leave old+new rows unioned in the directory
        import shutil
        shutil.rmtree(tok_dir, ignore_errors=True)
        os.makedirs(tok_dir, exist_ok=True)
        tok_mat.write_parquet(tok_dir)
        with open(tok_marker, "w") as f:
            f.write(fingerprint)
    stage_secs["extract_tokenize"] = time.time() - t0

    # ---- 4: dedup ----
    t0 = time.time()
    dedup_path = os.path.join(out_dir, "dedup.json")
    dd = None
    if resume and os.path.exists(dedup_path):
        with open(dedup_path) as f:
            dd = json.load(f)
        if dd.get("fingerprint") != fingerprint:
            dd = None          # stale: input/config changed since this marker
    if dd is not None:
        dropped: Set[int] = set(dd["dropped"])
        num_pairs = dd["num_pairs"]
    elif skip_dedup:
        dropped = set()
        num_pairs = 0
        with open(dedup_path, "w") as f:
            json.dump({"dropped": [], "num_pairs": 0, "clusters": [],
                       "skipped": True, "fingerprint": fingerprint}, f)
    else:
        tok_ids = tok_mat.select_columns(["doc_id", "simhash"])
        res = simhash_dedup(tok_ids, cfg, n_docs_hint=tok_mat.count())
        dropped = res.dropped
        num_pairs = res.num_pairs
        if res.stage_secs:
            for k, v in res.stage_secs.items():
                stage_secs[f"dedup.{k}"] = v
        with open(dedup_path, "w") as f:
            json.dump({"dropped": sorted(dropped), "num_pairs": res.num_pairs,
                       "clusters": res.clusters, "fingerprint": fingerprint}, f)
    dropped_ref = ray.put(dropped)
    stage_secs["dedup"] = time.time() - t0

    # ---- 4b: dense doc_id remap (T4 option, cfg.docid_mode="dense") ----
    # Runs AFTER dedup so the drop decisions are made in hash-id space and
    # are bit-identical to hash mode (the greedy near-dup acceptance
    # tie-breaks on doc_id order). Survivors get doc_id = rank of url in
    # global sort order — exactly 0..N-1 — so posting doc-id gaps shrink
    # from ~2^63/N to ~P and delta+varint segment bytes drop sharply. One
    # extra range-partition shuffle of the (already filtered) tokenized
    # relation; everything downstream (docmeta, segments, link scores
    # keyed by url) is id-agnostic. Deterministic across resumes: the
    # cached dedup.json is in hash space and url ranks are stable.
    if cfg.docid_mode == "dense":
        t0 = time.time()
        from ..stages.docid import assign_dense_doc_ids
        surv = tok_mat.map_batches(_filter_dropped(dropped_ref),
                                   batch_format="pyarrow")
        tok_mat = assign_dense_doc_ids(surv.drop_columns(["doc_id"]),
                                       key="url",
                                       id_col="doc_id").materialize()
        dropped_ref = ray.put(set())        # already filtered out
        stage_secs["dense_docid"] = time.time() - t0

    # ---- 5: docmeta + stats ----
    t0 = time.time()
    meta_dir = os.path.join(out_dir, "docmeta")
    meta_marker = os.path.join(meta_dir, "_SUCCESS")
    meta_mat = (tok_mat.select_columns(DOCMETA_COLS)
                .map_batches(_filter_dropped(dropped_ref), batch_format="pyarrow")
                .materialize())
    if not (resume and _marker_valid(meta_marker, fingerprint)):
        import shutil
        shutil.rmtree(meta_dir, ignore_errors=True)   # write_parquet appends
        os.makedirs(meta_dir, exist_ok=True)
        meta_mat.write_parquet(meta_dir)
        with open(meta_marker, "w") as f:
            f.write(fingerprint)
    num_docs = meta_mat.count()          # metadata-only on materialized data
    agg = meta_mat.aggregate(rd.aggregate.Sum("token_count"))
    total_len = float(agg["sum(token_count)"] or 0.0)
    avgdl = total_len / num_docs if num_docs else 0.0
    stage_secs["docmeta_stats"] = time.time() - t0

    # ---- 6: head-term discovery + df pre-aggregation ----
    t0 = time.time()
    head = head_terms(cfg) if cfg.head_term_salt > 0 else frozenset()
    # dynamic extension (SURVEY §4 skew): the static stemmed-stopword set
    # misses corpus-specific hot terms, which would land every posting on one
    # reducer. A sampled df pre-pass (distributed partial value_counts ->
    # groupby-sum -> threshold filter; only hot terms reach the driver) adds
    # any term whose estimated df exceeds dynamic_salt_df_frac of the corpus.
    # Misses cost parallelism only; step 6's exact-df pass below then gives
    # every salted term its true global df, so scoring is unaffected.
    head_path = os.path.join(out_dir, "head_terms.json")
    head_saved = None
    if resume and os.path.exists(head_path):
        with open(head_path) as f:
            hs = json.load(f)
        if hs.get("fingerprint") == fingerprint:
            head_saved = frozenset(hs["terms"])
    if head_saved is not None:
        # resume MUST reuse the original head set: partition routing depends
        # on it, and the sampled discovery below is not bit-stable across
        # block layouts — a drifted set would re-route salted terms while
        # completed partitions keep the old routing
        head = head_saved
    elif head and cfg.dynamic_salt_df_frac > 0 and num_docs > 0:
        frac = 1.0 if num_docs <= 20_000 else 0.1
        thresh = cfg.dynamic_salt_df_frac * num_docs * frac

        def term_counts(batch: pa.Table) -> pa.Table:
            terms_col = batch.column("terms").combine_chunks()
            vc = pc.list_flatten(terms_col).value_counts()
            return pa.table({"term": vc.field("values"),
                             "cnt": vc.field("counts").cast(pa.int64())})

        sample = tok_mat.select_columns(["doc_id", "terms"]) \
            .map_batches(_filter_dropped(dropped_ref), batch_format="pyarrow")
        if frac < 1.0:
            sample = sample.random_sample(frac, seed=23)
        hot_rows = (sample.map_batches(term_counts, batch_format="pyarrow")
                    .groupby("term").sum("cnt")
                    .map_batches(lambda b: b.filter(
                        pc.greater(b.column("sum(cnt)"), int(thresh))),
                        batch_format="pyarrow")
                    .take_all())
        head = frozenset(head | {r["term"] for r in hot_rows})
    if head_saved is None:
        with open(head_path, "w") as f:
            json.dump({"fingerprint": fingerprint, "terms": sorted(head)}, f)
    head_df: Dict[str, int] = {}
    if head:
        head_arr = pa.array(sorted(head), pa.string())

        def head_partial(batch: pa.Table) -> pa.Table:
            ex = explode_doc_terms(batch)
            mask = pc.is_in(ex.column("term"), value_set=head_arr)
            f = ex.filter(mask)
            if f.num_rows == 0:
                return pa.table({"term": pa.array([], pa.string()),
                                 "cnt": pa.array([], pa.int64())})
            g = f.group_by("term").aggregate([("term", "count")])
            return pa.table({"term": g.column("term"),
                             "cnt": g.column("term_count").cast(pa.int64())})

        tok_terms = tok_mat.select_columns(["doc_id", "terms", "tfs", "imps", "poss", "token_count"])
        tok_terms = tok_terms.map_batches(_filter_dropped(dropped_ref), batch_format="pyarrow")
        partial = tok_terms.map_batches(head_partial, batch_format="pyarrow")
        for row in partial.groupby("term").sum("cnt").take_all():
            head_df[row["term"]] = int(row["sum(cnt)"])
    stage_secs["head_df"] = time.time() - t0

    # ---- 7: the shuffle -> segments ----
    t0 = time.time()
    os.makedirs(seg_dir, exist_ok=True)
    total_parts = cfg.num_index_partitions + (cfg.head_term_salt if head else 0)
    done_parts: Set[int] = set()
    if resume:
        for p in range(total_parts):
            done_file = os.path.join(seg_dir, f"part-{p:05d}.done.json")
            try:
                with open(done_file) as f:
                    if json.load(f).get("input_fingerprint") == fingerprint:
                        done_parts.add(p)
            except (OSError, ValueError):
                pass

    manifest_rows: List[dict] = []
    if len(done_parts) < total_parts:
        tok_full = tok_mat.select_columns(["doc_id", "terms", "tfs", "imps", "poss", "token_count"])
        tok_full = tok_full.map_batches(_filter_dropped(dropped_ref), batch_format="pyarrow")
        dt = tok_full.map_batches(explode_doc_terms, batch_format="pyarrow")
        dt = dt.map_batches(AssignPartition(cfg, head), batch_format="pyarrow")
        if done_parts:
            skip_arr = pa.array(sorted(done_parts), pa.int64())
            dt = dt.map_batches(
                lambda b: b.filter(pc.invert(pc.is_in(b.column("part"), value_set=skip_arr))),
                batch_format="pyarrow")

        def build_part(group: pa.Table) -> pa.Table:
            if group.num_rows == 0:
                return pa.table({"manifest": pa.array([], pa.string())})
            part_id = int(group.column("part")[0].as_py())
            row = write_segment(part_id, group.drop(["part"]), seg_dir,
                                num_docs, avgdl, head_df, cfg, fingerprint)
            return pa.table({"manifest": pa.array([json.dumps(row)], pa.string())})

        out = dt.groupby("part").map_groups(build_part, batch_format="pyarrow")
        manifest_rows = [json.loads(r["manifest"]) for r in out.take_all()]
    # merge in already-done partitions (resume) & ensure empty partitions exist
    for p in range(total_parts):
        done_file = os.path.join(seg_dir, f"part-{p:05d}.done.json")
        if p in done_parts:
            with open(done_file) as f:
                manifest_rows.append(json.load(f))
        elif not os.path.exists(done_file):
            # partition received no rows: write an empty segment for it
            empty = pa.table({
                "doc_id": pa.array([], pa.int64()), "term": pa.array([], pa.string()),
                "tf": pa.array([], pa.int32()), "importance": pa.array([], pa.float32()),
                "positions": pa.array([], pa.list_(pa.int32())), "doclen": pa.array([], pa.int32()),
            })
            manifest_rows.append(write_segment(p, empty, seg_dir, num_docs, avgdl,
                                               head_df, cfg, fingerprint))
    manifest_rows.sort(key=lambda r: r["part"])
    stage_secs["segments"] = time.time() - t0

    # ---- 8: link scores ----
    t0 = time.time()
    ls_path = os.path.join(out_dir, "link_scores.parquet")
    ls_marker = ls_path + ".done"
    if not (resume and os.path.exists(ls_path) and _marker_valid(ls_marker, fingerprint)):
        # edge extraction + score join-back are dataset passes; the driver
        # holds only integer arrays during the power iteration
        # (graph/linkrank.py link_scores_dataset); output written distributed
        import shutil
        if os.path.isfile(ls_path):
            os.remove(ls_path)          # pre-r2 single-file layout
        shutil.rmtree(ls_path, ignore_errors=True)
        ls_ds = link_scores_dataset(meta_mat)
        ls_ds.write_parquet(ls_path)
        with open(ls_marker, "w") as f:
            f.write(fingerprint)
    stage_secs["link_scores"] = time.time() - t0

    manifest = {
        "version": 1,
        "fingerprint": fingerprint,
        "pages_path": os.path.abspath(input_path),
        "num_docs": num_docs,
        "avgdl": avgdl,
        "num_dropped": len(dropped),
        "num_dup_pairs": num_pairs,
        "num_partitions": cfg.num_index_partitions,
        "head_term_salt": cfg.head_term_salt if head else 0,
        "total_parts": total_parts,
        "head_df": head_df,
        "bm25_k1": cfg.bm25_k1,
        "bm25_b": cfg.bm25_b,
        "stem": cfg.stem,
        "partitions": manifest_rows,
        "stage_secs": stage_secs,
        "build_secs": time.time() - t_start,
    }
    with open(os.path.join(out_dir, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1)

    return BuildResult(out_dir, num_docs, avgdl, len(dropped), total_parts,
                       manifest_rows, time.time() - t_start, stage_secs)
