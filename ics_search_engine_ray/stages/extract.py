"""Extraction stage: pages -> cleaned text + weighted spans + links.

Covers SURVEY.md §2 ops M1 (.txt filter), M2/M3 (HTML parse + clean),
M4 (important-text weights), M5 (links), M10-adjacent title capture — as one
stateless ``map_batches`` task stage over zero-copy Arrow batches
(reference equivalents: indexer.py:52-63, document_processor.py:38-91).

The ``html`` column is dropped on output (SURVEY.md §7.3 wide-rows note):
multi-MB payloads never travel past this stage.
"""

from __future__ import annotations

from typing import Optional

import pyarrow as pa
import pyarrow.compute as pc

from ..config import EngineConfig, DEFAULT_CONFIG
from ..functions.htmlx import extract_page
from ..functions.memtune import tune_malloc

EXTRACT_SCHEMA = pa.schema([
    pa.field("url", pa.string()),
    pa.field("text", pa.string()),
    pa.field("title", pa.string()),
    pa.field("wt_texts", pa.list_(pa.string())),    # important-text strings
    pa.field("wt_weights", pa.list_(pa.float32())),  # matching summed weights
    pa.field("outgoing_links", pa.list_(pa.string())),
])


def filter_txt_urls(batch: pa.Table) -> pa.Table:
    """M1: drop documents whose url ends '.txt' (reference indexer.py:52-54)."""
    mask = pc.invert(pc.ends_with(batch.column("url"), ".txt"))
    return batch.filter(mask)


class ExtractBatch:
    """Stateless per-batch extractor (plain function semantics; kept as a
    class only to bind config once)."""

    def __init__(self, cfg: EngineConfig = DEFAULT_CONFIG):
        tune_malloc()
        self.tag_weights = cfg.tag_weight_map

    def __call__(self, batch: pa.Table) -> pa.Table:
        batch = filter_txt_urls(batch)
        urls = batch.column("url").to_pylist()
        htmls = batch.column("html").to_pylist()
        texts, titles, wts, wws, links = [], [], [], [], []
        for url, html in zip(urls, htmls):
            pe = extract_page(html if html is not None else b"", url, self.tag_weights)
            texts.append(pe.text)
            titles.append(pe.title)
            wts.append([t for t, _ in pe.weighted_text])
            wws.append([w for _, w in pe.weighted_text])
            links.append(pe.links)
        return pa.Table.from_arrays(
            [
                pa.array(urls, pa.string()),
                pa.array(texts, pa.string()),
                pa.array(titles, pa.string()),
                pa.array(wts, pa.list_(pa.string())),
                pa.array(wws, pa.list_(pa.float32())),
                pa.array(links, pa.list_(pa.string())),
            ],
            schema=EXTRACT_SCHEMA,
        )


def extract_dataset(pages, cfg: EngineConfig = DEFAULT_CONFIG):
    """pages Dataset (url, html, ...) -> extracted docs Dataset."""
    return pages.map_batches(
        ExtractBatch(cfg),
        batch_format="pyarrow",
        batch_size=cfg.extract_batch_size,
    )
