"""Incremental indexing: merge N built indexes into one (compaction).

The reference rebuilds from scratch whenever the corpus grows ("a rebuilt
index replaces the old one", SURVEY §1). At 100 TB that is untenable: new
crawl slices should be indexed alone and MERGED. This tool reindexes from
the *segments* — skipping extract, tokenize and per-corpus dedup, the
expensive 80% of a build:

1. docmeta union -> exact doc_id dedupe (identical pages crawled into two
   slices share the url-hash doc_id; first copy wins) -> OPTIONAL
   cross-corpus SimHash near-dedup over the stored fingerprints (the same
   exact LSH machinery as the build; min-doc_id-greedy winners),
2. every source segment decodes back to doc_terms rows in parallel (one
   task per (index, partition)), dropped/duplicate docs filtered out,
3. the standard AssignPartition -> groupby(part) -> write_segment shuffle
   rebuilds segments with the MERGED global stats (num_docs, avgdl, head
   dfs recomputed exactly), so BM25 scores are correct for the union —
   merging is not score-concatenation,
4. link scores recompute over the merged docmeta (distributed passes).

Requirements: sources share the stem setting; doc_ids are url-hashes (or
otherwise collision-free across sources except for identical documents).
"""

from __future__ import annotations

import hashlib
import json
import os
import time
from typing import Dict, List, Optional, Set

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..config import EngineConfig, DEFAULT_CONFIG, head_terms
from ..graph.linkrank import link_scores_dataset
from ..index.segments import SegmentReader, write_segment
from ..stages.common import filter_dropped_ids
from ..stages.dedup import simhash_dedup
from .build import AssignPartition, DOCMETA_COLS


_EMPTY_DOC_TERMS = pa.table({
    "doc_id": pa.array([], pa.int64()), "term": pa.array([], pa.string()),
    "tf": pa.array([], pa.int32()), "importance": pa.array([], pa.float32()),
    "positions": pa.array([], pa.list_(pa.int32())),
    "doclen": pa.array([], pa.int32()),
})


def _first_per_doc_id(meta):
    """Dataset -> one row per doc_id (vectorized run-boundary keep-first
    inside coarse hash groups; duplicate ids come from identical docs)."""
    def add_ckey(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_numpy(zero_copy_only=False)
        return b.append_column("_ck", pa.array(ids % 64, pa.int64()))

    def keep_first(g: pa.Table) -> pa.Table:
        g = g.sort_by([("doc_id", "ascending")])
        ids = g.column("doc_id").to_numpy(zero_copy_only=False)
        first = np.concatenate(([True], ids[1:] != ids[:-1]))
        return g.filter(pa.array(first)).drop(["_ck"])

    return meta.map_batches(add_ckey, batch_format="pyarrow") \
        .groupby("_ck").map_groups(keep_first, batch_format="pyarrow")


def _decode_partition(index_dir: str, part: int) -> pa.Table:
    """One source segment -> doc_terms rows (tf/importance/doclen/positions
    round-trip; scores are recomputed downstream from merged stats)."""
    base = os.path.join(index_dir, "segments", f"part-{part:05d}")
    r = SegmentReader(base)
    dids, terms, tfs, imps, poss, dls = [], [], [], [], [], []
    for t in r.terms():
        tp = r.postings(t, with_positions=True)
        if tp is None or not tp.doc_ids.size:
            continue
        dids.append(tp.doc_ids)
        terms.extend([t] * tp.doc_ids.size)
        tfs.append(tp.tf)
        imps.append(tp.importance)
        poss.extend([p.tolist() for p in tp.positions])
        dls.append(tp.doclen)
    r.close()
    if not dids:
        return _EMPTY_DOC_TERMS
    return pa.table({
        "doc_id": pa.array(np.concatenate(dids), pa.int64()),
        "term": pa.array(terms, pa.string()),
        "tf": pa.array(np.concatenate(tfs).astype(np.int32), pa.int32()),
        "importance": pa.array(np.concatenate(imps).astype(np.float32), pa.float32()),
        "positions": pa.array(poss, pa.list_(pa.int32())),
        "doclen": pa.array(np.concatenate(dls).astype(np.int32), pa.int32()),
    })


def merge_indexes(index_dirs: List[str], out_dir: str,
                  cfg: Optional[EngineConfig] = None,
                  near_dedup: bool = True) -> dict:
    """Merge built indexes into ``out_dir``; returns the manifest dict."""
    import ray
    import ray.data as rd

    t_start = time.time()
    manifests = []
    for d in index_dirs:
        with open(os.path.join(d, "manifest.json")) as f:
            manifests.append(json.load(f))
    stems = {m["stem"] for m in manifests}
    if len(stems) != 1:
        raise ValueError(f"cannot merge indexes with mixed stem settings: {stems}")
    if cfg is None:
        m0 = manifests[0]
        cfg = DEFAULT_CONFIG.with_(stem=m0["stem"], bm25_k1=m0["bm25_k1"],
                                   bm25_b=m0["bm25_b"])
    os.makedirs(out_dir, exist_ok=True)
    seg_dir = os.path.join(out_dir, "segments")
    os.makedirs(seg_dir, exist_ok=True)
    fingerprint = hashlib.md5(
        ("merge|" + "|".join(os.path.abspath(d) for d in index_dirs)).encode()
    ).hexdigest()[:16]

    # ---- 1: docmeta union -> id dedupe -> cross-corpus near-dedup ----
    def ensure_title(b: pa.Table) -> pa.Table:
        # pre-title index layouts (the query engine tolerates them too)
        if "title" not in b.column_names:
            b = b.append_column("title", pa.array([""] * b.num_rows, pa.string()))
        return b.select(DOCMETA_COLS)

    # each source read + normalized separately, then unioned — a single
    # read_parquet over mixed (pre/post-title) schemas fails at read time
    metas = []
    for d in index_dirs:
        md = os.path.join(d, "docmeta")
        files = sorted(os.path.join(md, f) for f in os.listdir(md)
                       if f.endswith(".parquet"))
        metas.append(rd.read_parquet(files)
                     .map_batches(ensure_title, batch_format="pyarrow"))
    meta = metas[0].union(*metas[1:]) if len(metas) > 1 else metas[0]
    meta = _first_per_doc_id(meta).materialize()
    # tombstone compaction: docs deleted from any source drop out of the
    # merged index entirely (meta, stats, AND postings — the same
    # dropped-id filter the near-dedup path uses), and the merged index
    # starts with an empty tombstone set
    from ..query.engine import load_tombstones
    tombs: Set[int] = set()
    for d in index_dirs:
        tombs.update(load_tombstones(d).tolist())
    if tombs:
        # filter BEFORE near-dedup so a deleted doc can never win a
        # near-dup cluster and take its live partner down with it
        tomb_ref = ray.put(tombs)
        meta = meta.map_batches(filter_dropped_ids(tomb_ref),
                                batch_format="pyarrow").materialize()
    dropped: Set[int] = set(tombs)
    num_pairs = 0
    if near_dedup:
        res = simhash_dedup(meta.select_columns(["doc_id", "simhash"]), cfg)
        dropped |= res.dropped
        num_pairs = res.num_pairs
    dropped_ref = ray.put(dropped)
    meta_f = meta.map_batches(filter_dropped_ids(dropped_ref),
                              batch_format="pyarrow").materialize()
    meta_dir = os.path.join(out_dir, "docmeta")
    os.makedirs(meta_dir, exist_ok=True)
    meta_f.select_columns(DOCMETA_COLS).write_parquet(meta_dir)
    num_docs = meta_f.count()
    agg = meta_f.aggregate(rd.aggregate.Sum("token_count"))
    total_len = float(agg["sum(token_count)"] or 0.0)
    avgdl = total_len / num_docs if num_docs else 0.0

    # ---- 2: segments -> doc_terms (one decode task per source partition) --
    items = [{"dir": os.path.abspath(d), "part": p}
             for d, m in zip(index_dirs, manifests)
             for p in range(int(m["total_parts"]))]

    def decode(b: pa.Table) -> pa.Table:
        tables = [_decode_partition(d, int(p))
                  for d, p in zip(b.column("dir").to_pylist(),
                                  b.column("part").to_pylist())]
        return pa.concat_tables(tables) if tables else _EMPTY_DOC_TERMS

    dt = rd.from_items(items).map_batches(decode, batch_format="pyarrow",
                                          batch_size=1)
    dt = dt.map_batches(filter_dropped_ids(dropped_ref), batch_format="pyarrow")

    # duplicate docs (same doc_id from two sources) contribute identical
    # rows; keep one per (term, doc_id) inside each partition group below.

    # ---- head terms + exact merged dfs ----
    head = head_terms(cfg) if cfg.head_term_salt > 0 else frozenset()
    for m in manifests:
        head = frozenset(head | set(m.get("head_df", {})))
    head_df: Dict[str, int] = {}
    if head:
        head_arr = pa.array(sorted(head), pa.string())

        def head_partial(batch: pa.Table) -> pa.Table:
            mask = pc.is_in(batch.column("term"), value_set=head_arr)
            f = batch.filter(mask)
            if f.num_rows == 0:
                return pa.table({"term": pa.array([], pa.string()),
                                 "doc_id": pa.array([], pa.int64())})
            return f.select(["term", "doc_id"])

        # distinct doc_id per term (identical docs appear in several sources;
        # they must count once) — double groupby over head-term rows only
        hp = dt.map_batches(head_partial, batch_format="pyarrow")
        distinct = hp.groupby(["term", "doc_id"]).count()
        for row in distinct.groupby("term").count().take_all():
            head_df[row["term"]] = int(row["count()"])

    # ---- 3: the standard shuffle with merged stats ----
    total_parts = cfg.num_index_partitions + (cfg.head_term_salt if head else 0)
    dtp = dt.map_batches(AssignPartition(cfg, head), batch_format="pyarrow")

    def build_part(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return pa.table({"manifest": pa.array([], pa.string())})
        part_id = int(group.column("part")[0].as_py())
        g = group.drop(["part"]).sort_by([("term", "ascending"),
                                          ("doc_id", "ascending")])
        terms = g.column("term").to_numpy(zero_copy_only=False)
        ids = g.column("doc_id").to_numpy(zero_copy_only=False)
        keep = np.concatenate(([True], (ids[1:] != ids[:-1]) | (terms[1:] != terms[:-1])))
        g = g.filter(pa.array(keep))      # identical-doc duplicate rows
        row = write_segment(part_id, g, seg_dir, num_docs, avgdl, head_df,
                            cfg, fingerprint)
        return pa.table({"manifest": pa.array([json.dumps(row)], pa.string())})

    out = dtp.groupby("part").map_groups(build_part, batch_format="pyarrow")
    manifest_rows = [json.loads(r["manifest"]) for r in out.take_all()]
    done = {r["part"] for r in manifest_rows}
    for p in range(total_parts):
        if p not in done:
            manifest_rows.append(write_segment(p, _EMPTY_DOC_TERMS, seg_dir, num_docs,
                                               avgdl, head_df, cfg, fingerprint))
    manifest_rows.sort(key=lambda r: r["part"])

    # ---- 4: link scores over the merged docmeta ----
    ls_path = os.path.join(out_dir, "link_scores.parquet")
    import shutil
    shutil.rmtree(ls_path, ignore_errors=True)
    link_scores_dataset(meta_f).write_parquet(ls_path)

    manifest = {
        "version": 1,
        "fingerprint": fingerprint,
        "pages_path": ";".join(os.path.abspath(d) for d in index_dirs),
        "merged_from": [os.path.abspath(d) for d in index_dirs],
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
        "stage_secs": {},
        "build_secs": time.time() - t_start,
    }
    with open(os.path.join(out_dir, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1)
    return manifest
