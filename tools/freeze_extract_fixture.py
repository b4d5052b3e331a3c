"""Freeze the extract_text oracle fixture (VERDICT r2 "what's missing" #3).

Writes ``tests/fixtures/extract_expected.parquet`` with one row per
extracted page at each testdata scale factor: ``(n_docs, url, text_md5)``.
``n_docs`` (the row count of that sf's documents.parquet) keys the rows to a
scale factor so a single fixture serves every sf dir; the oracle SQL in
``__ray_entry__.oracle_sql()`` embeds these rows as VALUES and filters on
``n_docs = (SELECT count(*) FROM documents)``.

FROZEN ARTIFACT — this file was run ONCE (2026-08-17, round 3) against an
extractor pinned by the 30 hand-authored bs4 goldens
(tests/test_extract_goldens.py). The committed parquet is the oracle; the
engine's live output is compared against it, so a future extraction change
shows up as a CORRECTNESS failure instead of silently re-deriving the
expectation. Regenerate only for an INTENTIONAL, golden-backed semantics
change, and bump the build fingerprint (pipelines/build.py) in the same
commit.

Usage: python tools/freeze_extract_fixture.py
"""
import hashlib
import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq
import ray

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

ray.init(address="local", num_cpus=16, include_dashboard=False,
         logging_level="ERROR")

import ray.data as rd

import __ray_entry__  # noqa: F401  (registers the package by-value for workers)
from ics_search_engine_ray.config import DEFAULT_CONFIG
from ics_search_engine_ray.sources.pages import generate_pages
from ics_search_engine_ray.stages.extract import extract_dataset

out_path = os.path.join(REPO, "tests", "fixtures", "extract_expected.parquet")
# sf identity key: (row count, sum of text codepoint lengths) of documents —
# both computable in ANSI SQL over the registered `documents` view.
# n_docs alone is NOT unique (sf0.001 and sf0.01 both carry 500 docs with
# different content).
rows = {"n_docs": [], "len_sum": [], "url": [], "text_md5": []}
for sf in ("sf0.001", "sf0.01", "sf0.1"):
    sf_dir = f"/root/testdata/{sf}"
    import pyarrow.compute as pc
    dtbl = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                         columns=["text"])
    n_docs = dtbl.num_rows
    len_sum = int(pc.sum(pc.utf8_length(dtbl.column("text"))).as_py())
    pages_dir = generate_pages(sf_dir)
    docs = extract_dataset(
        rd.read_parquet(pages_dir, columns=["url", "html"]), DEFAULT_CONFIG)
    n_before = len(rows["url"])
    for b in docs.iter_batches(batch_format="pyarrow"):
        for u, t in zip(b.column("url").to_pylist(),
                        b.column("text").to_pylist()):
            rows["n_docs"].append(n_docs)
            rows["len_sum"].append(len_sum)
            rows["url"].append(u)
            rows["text_md5"].append(
                hashlib.md5((t or "").encode("utf-8")).hexdigest())
    print(f"{sf}: n_docs={n_docs} len_sum={len_sum} "
          f"pages={len(rows['url']) - n_before}")

tbl = pa.table({
    "n_docs": pa.array(rows["n_docs"], pa.int64()),
    "len_sum": pa.array(rows["len_sum"], pa.int64()),
    "url": pa.array(rows["url"], pa.string()),
    "text_md5": pa.array(rows["text_md5"], pa.string()),
}).sort_by([("n_docs", "ascending"), ("len_sum", "ascending"),
            ("url", "ascending")])
os.makedirs(os.path.dirname(out_path), exist_ok=True)
pq.write_table(tbl, out_path, compression="zstd")
print(f"wrote {tbl.num_rows} rows -> {out_path}")
ray.shutdown()
