"""Tokenize + per-doc term stats + SimHash as an actor-pool stage.

Covers SURVEY.md §2 ops M6-M9, T1, T4: Porter-stemmed tokenization with the
reference's exact freq/importance/position semantics
(components/token_processor.py:14-33 — body tokens contribute tf and
positions; important-text tokens contribute tf and importance but NO
positions), the per-doc 128-bit SimHash over body tokens
(document_processor.py:61-70), token_count = number of body tokens, and
deterministic doc_id assignment.

doc_id (T4): the reference used an arrival-order counter behind a lock
(multithread_indexer.py:102-104) — nondeterministic under parallelism. Here
``doc_id = low 63 bits of md5(url)``: a pure function of the row, identical
across runs / parallelism levels / resumes, no coordination, no shuffle.
(A dense sort-rank assignment is available in stages/docid.py when compact
ids matter more than coordination-free assignment.)

Stateful setup (compiled regex, stem cache, simhash word-bit cache) happens
once per actor in ``__init__``; batches stream through ``__call__``.
"""

from __future__ import annotations

import hashlib
from typing import List

import pyarrow as pa

from ..config import EngineConfig, DEFAULT_CONFIG
from ..functions.memtune import tune_malloc
from ..functions.simhash import SimHasher
from ..functions.tokenizer import Tokenizer

TOKENIZED_SCHEMA = pa.schema([
    pa.field("doc_id", pa.int64()),
    pa.field("url", pa.string()),
    pa.field("title", pa.string()),
    pa.field("simhash", pa.binary(16)),
    pa.field("token_count", pa.int32()),
    pa.field("outgoing_links", pa.list_(pa.string())),
    pa.field("terms", pa.list_(pa.string())),
    pa.field("tfs", pa.list_(pa.int32())),
    pa.field("imps", pa.list_(pa.float32())),
    pa.field("poss", pa.list_(pa.list_(pa.int32()))),
])


def url_doc_id(url: str) -> int:
    """Deterministic 63-bit doc id from the url (stable across runs)."""
    return int.from_bytes(hashlib.md5(url.encode("utf-8")).digest()[:8], "big") & 0x7FFF_FFFF_FFFF_FFFF


class TokenizeSimhash:
    """Actor-pool batch fn: extracted docs -> tokenized doc rows."""

    def __init__(self, cfg: EngineConfig = DEFAULT_CONFIG):
        tune_malloc()
        self.cfg = cfg
        self.tokenizer = Tokenizer(stem=cfg.stem)
        self.simhasher = SimHasher()
        # memo for important-text strings (titles/headers repeat across docs;
        # reference memoizes tokenize the same way, token_processor.py:10-12)
        self._imp_cache: dict = {}

    def _tok_cached(self, text: str) -> List[str]:
        toks = self._imp_cache.get(text)
        if toks is None:
            toks = self.tokenizer.tokens(text)
            if len(self._imp_cache) < 100_000:
                self._imp_cache[text] = toks
        return toks

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        texts = batch.column("text").to_pylist()
        titles = batch.column("title").to_pylist()
        wt_texts = batch.column("wt_texts").to_pylist()
        wt_weights = batch.column("wt_weights").to_pylist()
        links = batch.column("outgoing_links").to_pylist()
        # explicit doc_id column (e.g. indexing a keyed text table) wins over
        # the url-hash assignment
        given_ids = (batch.column("doc_id").to_pylist()
                     if "doc_id" in batch.column_names else None)

        out = {k: [] for k in ("doc_id", "simhash", "token_count", "terms", "tfs", "imps", "poss")}
        for ri, (url, text, wts, wws) in enumerate(zip(urls, texts, wt_texts, wt_weights)):
            body_tokens = self.tokenizer.tokens(text)
            # freq_map semantics: token -> (tf, importance, positions)
            freq: dict = {}
            for pos, tok in enumerate(body_tokens):
                e = freq.get(tok)
                if e is None:
                    freq[tok] = [1, 0.0, [pos]]
                else:
                    e[0] += 1
                    e[2].append(pos)
            for wtext, weight in zip(wts, wws):
                for tok in self._tok_cached(wtext):
                    e = freq.get(tok)
                    if e is None:
                        freq[tok] = [1, float(weight), []]
                    else:
                        e[0] += 1
                        e[1] += float(weight)
            out["doc_id"].append(given_ids[ri] if given_ids is not None else url_doc_id(url))
            out["simhash"].append(self.simhasher.fingerprint(body_tokens))
            out["token_count"].append(len(body_tokens))
            out["terms"].append(list(freq.keys()))
            out["tfs"].append([e[0] for e in freq.values()])
            out["imps"].append([e[1] for e in freq.values()])
            out["poss"].append([e[2] for e in freq.values()])

        return pa.Table.from_arrays(
            [
                pa.array(out["doc_id"], pa.int64()),
                pa.array(urls, pa.string()),
                pa.array(titles, pa.string()),
                pa.array(out["simhash"], pa.binary(16)),
                pa.array(out["token_count"], pa.int32()),
                pa.array(links, pa.list_(pa.string())),
                pa.array(out["terms"], pa.list_(pa.string())),
                pa.array(out["tfs"], pa.list_(pa.int32())),
                pa.array(out["imps"], pa.list_(pa.float32())),
                pa.array(out["poss"], pa.list_(pa.list_(pa.int32()))),
            ],
            schema=TOKENIZED_SCHEMA,
        )


def _pool_size(cfg: EngineConfig) -> tuple:
    """Actor-pool (min, max) sized from cluster CPUs: the autoscaling pool
    ramps too slowly from a tiny min (measured: 128 queued tasks drained by
    ~5 actors while the pool 'scaled up'), so start at half the cluster and
    let it grow to the full configured max."""
    import ray
    lo, hi = cfg.tokenize_concurrency
    try:
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    return (max(lo, cpus // 2), max(hi, cpus))


def tokenize_dataset(docs, cfg: EngineConfig = DEFAULT_CONFIG):
    """Extracted docs Dataset -> tokenized Dataset (actor pool)."""
    return docs.map_batches(
        TokenizeSimhash,
        fn_constructor_args=(cfg,),
        batch_format="pyarrow",
        batch_size=cfg.tokenize_batch_size,
        concurrency=_pool_size(cfg),
    )
