"""Migrate reference-layout JSON artifacts into this engine's index format
(SURVEY §2 S10 — the reference's ``utils/partials_handler.py`` side utility,
re-aimed: instead of JSON->pickle, it converts a reference index into our
compressed segments so a user of the reference can switch engines and keep
their built index).

Reference artifact layout (utils/index_generator.py, indexer.py:119-150):

- ``full_analytics/index.json``     — {term: [[doc_id, frequency, importance,
                                      tf_idf, positions], ...]}
- ``full_analytics/documents.json`` — {doc_id: {url, simhash (128-char
                                      bitstring), token_count, outgoing_links}}
- ``full_analytics/link_scores.json`` — {url: {hits: {authority, hub},
                                      pagerank}} (optional)

The migration rebuilds doc_terms rows from the postings (doclen joined from
documents.json — the reference's stored tf_idf is recomputable, and our
segments store tf/importance/doclen, scoring at query time), then reuses the
standard build shuffle: AssignPartition -> groupby(part) -> write_segment.
Output is a complete index dir (segments + docmeta + link_scores +
manifest) answering queries through the same SearchIndex / actor pool.

The JSON parse is driver-side by necessity (the reference format is one
monolithic dict — precisely the thing our partitioned format replaces); rows
stream into Ray in bounded Arrow chunks.
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Iterator, List

import numpy as np
import pyarrow as pa

from ..config import EngineConfig, DEFAULT_CONFIG
from ..index.segments import write_segment
from .build import AssignPartition, term_partition

_CHUNK_ROWS = 200_000


def _doc_terms_chunks(index_json: dict, doclen_of: Dict[int, int]) -> Iterator[pa.Table]:
    dids: List[int] = []
    terms: List[str] = []
    tfs: List[int] = []
    imps: List[float] = []
    poss: List[List[int]] = []
    dls: List[int] = []
    for term, postings in index_json.items():
        for p in postings:
            # tuple layout: (doc_id, frequency, importance, tf_idf, positions)
            did = int(p[0])
            dids.append(did)
            terms.append(term)
            tfs.append(int(p[1]))
            imps.append(float(p[2]))
            poss.append([int(x) for x in (p[4] if len(p) > 4 else [])])
            dls.append(int(doclen_of.get(did, 0)))
        if len(dids) >= _CHUNK_ROWS:
            yield _chunk_table(dids, terms, tfs, imps, poss, dls)
            dids, terms, tfs, imps, poss, dls = [], [], [], [], [], []
    if dids:
        yield _chunk_table(dids, terms, tfs, imps, poss, dls)


def _chunk_table(dids, terms, tfs, imps, poss, dls) -> pa.Table:
    return pa.table({
        "doc_id": pa.array(dids, pa.int64()),
        "term": pa.array(terms, pa.string()),
        "tf": pa.array(tfs, pa.int32()),
        "importance": pa.array(imps, pa.float32()),
        "positions": pa.array(poss, pa.list_(pa.int32())),
        "doclen": pa.array(dls, pa.int32()),
    })


def migrate_reference_index(src_dir: str, out_dir: str,
                            cfg: EngineConfig = DEFAULT_CONFIG) -> dict:
    """Convert a reference ``full_analytics/`` directory into an index dir.

    Returns the manifest dict (also written to ``out_dir/manifest.json``).
    """
    import ray.data as rd

    t0 = time.time()
    os.makedirs(out_dir, exist_ok=True)
    seg_dir = os.path.join(out_dir, "segments")
    os.makedirs(seg_dir, exist_ok=True)

    with open(os.path.join(src_dir, "documents.json")) as f:
        documents = json.load(f)
    with open(os.path.join(src_dir, "index.json")) as f:
        index_json = json.load(f)

    # ---- docmeta ----
    doclen_of: Dict[int, int] = {}
    rows = {"doc_id": [], "url": [], "title": [], "simhash": [],
            "token_count": [], "outgoing_links": []}
    for did_s, d in documents.items():
        did = int(did_s)
        tc = int(d.get("token_count", 0))
        doclen_of[did] = tc
        rows["doc_id"].append(did)
        rows["url"].append(d.get("url", ""))
        rows["title"].append(d.get("title", "") or "")
        bitstr = d.get("simhash", "0" * 128)
        rows["simhash"].append(
            np.packbits(np.frombuffer(bitstr.encode(), dtype=np.uint8) - ord("0")).tobytes())
        rows["token_count"].append(tc)
        rows["outgoing_links"].append(list(d.get("outgoing_links", []) or []))
    meta_tbl = pa.table({
        "doc_id": pa.array(rows["doc_id"], pa.int64()),
        "url": pa.array(rows["url"], pa.string()),
        "title": pa.array(rows["title"], pa.string()),
        "simhash": pa.array(rows["simhash"], pa.binary(16)),
        "token_count": pa.array(rows["token_count"], pa.int32()),
        "outgoing_links": pa.array(rows["outgoing_links"], pa.list_(pa.string())),
    })
    meta_dir = os.path.join(out_dir, "docmeta")
    os.makedirs(meta_dir, exist_ok=True)
    import pyarrow.parquet as pq
    pq.write_table(meta_tbl, os.path.join(meta_dir, "part-0.parquet"))

    num_docs = len(doclen_of)
    avgdl = (sum(doclen_of.values()) / num_docs) if num_docs else 0.0

    # ---- link scores (reference layout -> our parquet) ----
    ls_src = os.path.join(src_dir, "link_scores.json")
    ls_path = os.path.join(out_dir, "link_scores.parquet")
    if os.path.exists(ls_src):
        with open(ls_src) as f:
            ls = json.load(f)
        urls = sorted(ls)
        pq.write_table(pa.table({
            "url": pa.array(urls, pa.string()),
            "auth": pa.array([float(ls[u].get("hits", {}).get("authority", 0.0)) for u in urls], pa.float64()),
            "hub": pa.array([float(ls[u].get("hits", {}).get("hub", 0.0)) for u in urls], pa.float64()),
            "pagerank": pa.array([float(ls[u].get("pagerank", 0.0)) for u in urls], pa.float64()),
        }), ls_path)

    # ---- segments via the standard shuffle ----
    fingerprint = f"migrated:{os.path.abspath(src_dir)}"
    head: frozenset = frozenset()          # migrated indexes: no salting
    cfg = cfg.with_(head_term_salt=0)
    chunks = list(_doc_terms_chunks(index_json, doclen_of))
    dt = rd.from_arrow(chunks) if chunks else rd.from_arrow(_chunk_table([], [], [], [], [], []))
    dt = dt.map_batches(AssignPartition(cfg, head), batch_format="pyarrow")

    def build_part(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return pa.table({"manifest": pa.array([], pa.string())})
        part_id = int(group.column("part")[0].as_py())
        row = write_segment(part_id, group.drop(["part"]), seg_dir,
                            num_docs, avgdl, {}, cfg, fingerprint)
        return pa.table({"manifest": pa.array([json.dumps(row)], pa.string())})

    out = dt.groupby("part").map_groups(build_part, batch_format="pyarrow")
    manifest_rows = [json.loads(r["manifest"]) for r in out.take_all()]
    done = {r["part"] for r in manifest_rows}
    for p in range(cfg.num_index_partitions):
        if p not in done:
            empty = _chunk_table([], [], [], [], [], [])
            manifest_rows.append(write_segment(p, empty, seg_dir, num_docs,
                                               avgdl, {}, cfg, fingerprint))
    manifest_rows.sort(key=lambda r: r["part"])

    manifest = {
        "version": 1,
        "fingerprint": fingerprint,
        "pages_path": os.path.abspath(src_dir),
        "migrated_from": "reference-json",
        "num_docs": num_docs,
        "avgdl": avgdl,
        "num_dropped": 0,
        "num_dup_pairs": 0,
        "num_partitions": cfg.num_index_partitions,
        "head_term_salt": 0,
        "total_parts": cfg.num_index_partitions,
        "head_df": {},
        "bm25_k1": cfg.bm25_k1,
        "bm25_b": cfg.bm25_b,
        "stem": cfg.stem,
        "partitions": manifest_rows,
        "stage_secs": {},
        "build_secs": time.time() - t0,
    }
    with open(os.path.join(out_dir, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1)
    return manifest
