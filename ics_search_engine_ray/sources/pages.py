"""Deterministic synthetic web-page corpus (Common-Crawl-style Parquet).

``BASELINE.json.input_hint`` fixes the input shape:
``pages(url:string, warc_ts:timestamp[us], html:binary, text:string,
lang:string)``. No such table ships with the testdata, so this module derives
one *deterministically* from ``documents.parquet`` (pure function of the table
contents — no wall clock, no randomness), at any replication factor, as a Ray
Data pipeline (``read_parquet -> flat-map batches -> write_parquet``) so the
generator itself scales like the engine it feeds.

The corpus deliberately exercises every branch the reference handles
(FIXTURES.md §1):
- ``.txt`` URLs that must be filtered (reference indexer.py:52-54),
- pages with and without ``<p>`` tags, and non-utf8 pages (both branches of
  soupify, document_processor.py:38-48),
- broken HTML with unclosed tags,
- title/h1/h2/h3/b/strong spans (TAG_WEIGHTS, constants.py:46-53),
- absolute, relative, self and external links (+ a link graph over the corpus,
  including external targets, for the PageRank mass-leak quirk, pagerank.py:26-31),
- exact- and near-duplicate pages above the 0.85 SimHash threshold plus
  below-threshold controls (document_processor.py:72-79),
- a ``#fragment`` URL slice (defragged only at result time, search.py:194),
- per-page rare tokens so vocabulary grows with corpus size.

The ``text`` column carries the oracle extraction (the per-row invariant:
our extract stage must reproduce it byte-identically per url).
"""

from __future__ import annotations

import hashlib
import os
from typing import Dict, List, Optional

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..config import TAG_WEIGHTS
from ..functions.htmlx import extract_page

PAGES_SCHEMA = pa.schema([
    pa.field("url", pa.string()),
    pa.field("warc_ts", pa.timestamp("us")),
    pa.field("html", pa.binary()),
    pa.field("text", pa.string()),
    pa.field("lang", pa.string()),
])

_EPOCH_US = 1_734_480_000_000_000  # 2024-12-18T00:00:00Z, fixed


def page_url(doc_id: int, rep: int) -> str:
    site = doc_id % 20
    base = f"https://src{site}.example.edu/p/{doc_id}" + (f"/r{rep}" if rep else "")
    h = (doc_id * 31 + rep * 7) % 100
    if h == 7:
        return base + "/file.txt"
    if h == 37:
        return base + "#section2"
    return base


def _chunk(words: List[str], size: int) -> List[List[str]]:
    return [words[i:i + size] for i in range(0, len(words), size)] or [[]]


def render_page_html(doc_id: int, rep: int, text: str, n_docs: int,
                     texts_by_id: Optional[Dict[int, str]] = None) -> bytes:
    """Pure function (doc_id, rep, text, corpus size) -> html bytes."""
    # duplicate injection: partner-based, deterministic
    if texts_by_id is not None and rep == 0:
        if doc_id % 43 == 17 and (doc_id - 1) in texts_by_id:
            # exact duplicate of the previous doc's page (different url)
            return render_page_html(doc_id - 1, rep, texts_by_id[doc_id - 1], n_docs, None)
        if doc_id % 43 == 19 and (doc_id - 1) in texts_by_id:
            # near duplicate: same content plus a couple of rare words
            text = texts_by_id[doc_id - 1] + f" extra{doc_id} note{doc_id}"
            doc_id_render = doc_id - 1
            return _render(doc_id_render, rep, text, n_docs, near_of=doc_id)
    if rep > 0 and (doc_id + rep) % 17 == 0:
        # replicated builds: rep k duplicates rep 0 content exactly
        return _render(doc_id, 0, text, n_docs)
    if rep > 0:
        # distinct content per replica: rotate the body and swap in
        # rep-derived vocabulary so replicas are genuinely different pages
        # (without this every replica of a doc is a near-duplicate of every
        # other — a 90%-dup corpus that no real crawl resembles)
        words = text.split()
        if words:
            rot = (rep * 13) % len(words)
            words = words[rot:] + words[:rot]
            words = [f"w{rep}v{i % 31}" if (i + rep) % 5 == 0 else w
                     for i, w in enumerate(words)]
            text = " ".join(words)
    return _render(doc_id, rep, text, n_docs)


def _render(doc_id: int, rep: int, text: str, n_docs: int, near_of: Optional[int] = None) -> bytes:
    words = text.split()
    # doc-specific rare tokens interleaved through the body: grows vocabulary
    # with corpus size AND separates SimHash fingerprints (the shared Zipf
    # vocabulary alone would make most docs near-duplicates at 0.85)
    n_rare = max(3, len(words) // 10)
    rare = [f"tok{doc_id}r{rep}x{j}" for j in range(n_rare)]
    title = f"Doc {doc_id} " + " ".join(words[:4])
    h1 = " ".join(words[4:8]) or "heading one"
    h2 = " ".join(words[8:11]) or "heading two"
    h3 = " ".join(words[11:13]) or "heading three"

    # interleave rare tokens every 8 body words (repeated -> simhash weight)
    body_words = []
    for i, w in enumerate(words[13:]):
        body_words.append(w)
        if i % 8 == 7:
            body_words.append(rare[(i // 8) % n_rare])
    body_words += rare
    paras = _chunk(body_words, 40)
    broken = doc_id % 23 == 3
    no_p = doc_id % 29 == 11
    non_utf8 = doc_id % 41 == 13

    para_html = []
    for i, p in enumerate(paras):
        inner = " ".join(p)
        if i == 0 and len(p) > 4:
            lead = " ".join(p[:2])
            bolded = " ".join(p[2:4])
            rest = " ".join(p[4:])
            closer = "" if broken else "</b>"
            inner = f"{lead} <b>{bolded}{closer} {rest}"
        if i == 1 and p:
            inner = f"<strong>{p[0]}</strong> " + " ".join(p[1:])
        if no_p:
            para_html.append(f"<div>{inner}</div>")
        elif broken and i == len(paras) - 1:
            para_html.append(f"<p>{inner}")
        else:
            para_html.append(f"<p>{inner}</p>")

    self_url = page_url(doc_id if near_of is None else near_of, rep)
    targets = sorted({(doc_id * 2 + 5) % n_docs, (doc_id + 1) % n_docs, (doc_id + 7) % n_docs} - {doc_id})
    link_html = [f'<a href="{page_url(t, 0)}">d{t}</a>' for t in targets]
    link_html.append(f'<a href="http://external.example.com/e{doc_id % 7}">ext</a>')
    link_html.append(f'<a href="{self_url}">self</a>')
    link_html.append('<a href="/relative/path">rel</a>')

    html = (
        f"<html><head><title>{title}</title></head><body>"
        f"<h1>{h1}</h1><h2>{h2}</h2><h3>{h3}</h3>"
        + "".join(para_html)
        + "".join(link_html)
        + ("" if broken else "</body></html>")
    )
    if non_utf8:
        return ("<html><body>café page " + html[12:]).encode("latin-1", errors="replace")
    return html.encode("utf-8")


class GeneratePages:
    """flat-map batch fn: documents rows -> `replication` page rows each.

    The small documents table is broadcast (ray.put) once so duplicate
    injection can reference a partner row without a shuffle — the
    broadcast-small-side pattern (SURVEY.md §2.4 J1).
    """

    def __init__(self, texts_ref, n_docs: int, replication: int):
        import ray
        self.texts_by_id: Dict[int, str] = ray.get(texts_ref) if texts_ref is not None else None
        self.n_docs = n_docs
        self.replication = replication

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        langs = batch.column("lang").to_pylist()
        urls, tss, htmls, otexts, olangs = [], [], [], [], []
        for did, text, lang in zip(doc_ids, texts, langs):
            for rep in range(self.replication):
                url = page_url(did, rep)
                html = render_page_html(did, rep, text, self.n_docs, self.texts_by_id)
                urls.append(url)
                tss.append(_EPOCH_US + did * 1000 + rep)
                htmls.append(html)
                otexts.append(extract_page(html, url).text)
                olangs.append(lang)
        return pa.Table.from_arrays(
            [
                pa.array(urls, pa.string()),
                pa.array(tss, pa.timestamp("us")),
                pa.array(htmls, pa.binary()),
                pa.array(otexts, pa.string()),
                pa.array(olangs, pa.string()),
            ],
            schema=PAGES_SCHEMA,
        )


def generate_pages(sf_dir: str, out_dir: Optional[str] = None, replication: int = 1,
                   force: bool = False) -> str:
    """Generate (or reuse cached) pages parquet for a testdata sf dir.

    Returns the directory containing the pages parquet files.
    """
    import ray
    import ray.data as rd

    docs_path = os.path.join(sf_dir, "documents.parquet")
    if out_dir is None:
        tag = hashlib.md5(f"{os.path.abspath(sf_dir)}|{replication}|v5".encode()).hexdigest()[:12]
        out_dir = f"/tmp/icser_pages/{tag}"
    marker = os.path.join(out_dir, "_SUCCESS")
    if os.path.exists(marker) and not force:
        return out_dir
    os.makedirs(out_dir, exist_ok=True)

    tbl = pq.read_table(docs_path, columns=["doc_id", "text"])
    texts_by_id = dict(zip(tbl.column("doc_id").to_pylist(), tbl.column("text").to_pylist()))
    n_docs = len(texts_by_id)
    texts_ref = ray.put(texts_by_id)

    ds = rd.read_parquet(docs_path, columns=["doc_id", "text", "lang"])
    pages = ds.map_batches(
        GeneratePages,
        fn_constructor_args=(texts_ref, n_docs, replication),
        batch_format="pyarrow",
        batch_size=256,
        concurrency=(1, 8),
    )
    pages.write_parquet(out_dir)
    with open(marker, "w") as f:
        f.write("ok")
    return out_dir
