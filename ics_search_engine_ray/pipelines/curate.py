"""Corpus curation: the composed training-data pipeline (task brief).

One streaming pass computes quality signals per document and applies the
keep rules; a second (narrow) shuffle deduplicates the survivors exactly.
The text column never rides a shuffle: the signal pass hashes it in place
(128-bit md5 as two int64 columns) and drops it, so the dedup ``groupby``
carries only fixed-width rows, and the curated-corpus writer re-reads the
source filtered by the (small) dropped-id broadcast — the same
drop-set-broadcast shape the index build uses for near-dups
(pipelines/build.py docmeta filter).

Stages:
  1. ``signal_rows``: quality metrics (stages/text_analysis.quality_batch
     definitions, 6-dp rounded so the SQL oracle compares identically),
     token count, and the content hash — one vectorized ``map_batches``.
  2. rule filter (vectorized mask over the signal columns; thresholds in
     :class:`CurateRules`).
  3. exact dedup of survivors: ``groupby(hash)`` emits non-min doc_ids
     (the DROPPED set, O(duplicates)) via per-group vectorized argmin.
  4. anti-join: survivors minus broadcast dropped ids.

``curate_corpus`` additionally writes the curated documents (doc_id, text)
as partitioned parquet for downstream training jobs — resumable output per
the repo's sink conventions (fresh dir per run; Ray appends otherwise).
"""

from __future__ import annotations

import shutil
from dataclasses import dataclass

import numpy as np
import pyarrow as pa

from ..stages.dedup_text import _text_hash_batch
from ..stages.text_analysis import quality_batch, token_count_batch


@dataclass(frozen=True)
class CurateRules:
    """Keep thresholds; all comparisons run on the 6-dp-rounded signal
    values so the DuckDB oracle filters identically."""
    min_words: int = 20
    max_words: int = 100_000
    min_tokens: int = 15
    max_digit_ratio: float = 0.3
    max_stopword_ratio: float = 0.8
    min_mean_word_len: float = 2.0
    max_mean_word_len: float = 15.0


SIGNAL_COLUMNS = ("n_chars", "n_words", "n_tokens", "mean_word_len",
                  "stopword_ratio", "digit_ratio")


def signal_rows(batch: pa.Table) -> pa.Table:
    """(doc_id, signals..., hash_hi, hash_lo) — text consumed, not emitted."""
    q = quality_batch(batch)
    t = token_count_batch(batch)
    h = _text_hash_batch(batch)
    return pa.table({
        "doc_id": q.column("doc_id"),
        "n_chars": q.column("n_chars"),
        "n_words": q.column("n_words"),
        "n_tokens": t.column("n_tokens"),
        "mean_word_len": q.column("mean_word_len"),
        "stopword_ratio": q.column("stopword_ratio"),
        "digit_ratio": q.column("digit_ratio"),
        "hash_hi": h.column("hash_hi"),
        "hash_lo": h.column("hash_lo"),
    })


def _rule_mask(b: pa.Table, r: CurateRules) -> np.ndarray:
    nw = b.column("n_words").to_numpy(zero_copy_only=False)
    nt = b.column("n_tokens").to_numpy(zero_copy_only=False)
    dr = b.column("digit_ratio").to_numpy(zero_copy_only=False)
    sr = b.column("stopword_ratio").to_numpy(zero_copy_only=False)
    mw = b.column("mean_word_len").to_numpy(zero_copy_only=False)
    return ((nw >= r.min_words) & (nw <= r.max_words)
            & (nt >= r.min_tokens)
            & (dr <= r.max_digit_ratio)
            & (sr <= r.max_stopword_ratio)
            & (mw >= r.min_mean_word_len) & (mw <= r.max_mean_word_len))


def _dropped_dups(kept_signals):
    """groupby(content hash) -> non-min doc_ids (the dropped set)."""

    def non_min(g: pa.Table) -> pa.Table:
        if g.num_rows < 2:
            return pa.table({"doc_id": pa.array([], pa.int64())})
        ids = g.column("doc_id").to_numpy(zero_copy_only=False)
        return pa.table({"doc_id": pa.array(
            np.sort(ids)[1:], pa.int64())})

    dropped_ds = kept_signals.select_columns(["hash_hi", "hash_lo", "doc_id"]) \
        .groupby(["hash_hi", "hash_lo"]).map_groups(
            non_min, batch_format="pyarrow")
    dropped = set()
    for b in dropped_ds.iter_batches(batch_format="pyarrow"):
        dropped.update(b.column("doc_id").to_pylist())
    return dropped


def curate_dataset(docs, rules: CurateRules = CurateRules()):
    """documents(doc_id, text) -> (curated signal Dataset, dropped id set).

    The returned Dataset has (doc_id, *SIGNAL_COLUMNS) for every kept,
    dedup-surviving document; ``dropped`` is the exact-duplicate id set
    (O(duplicates) — broadcastable by construction).
    """
    import ray

    signals = docs.map_batches(signal_rows, batch_format="pyarrow")

    def keep(b: pa.Table) -> pa.Table:
        return b.filter(pa.array(_rule_mask(b, rules)))

    kept = signals.map_batches(keep, batch_format="pyarrow").materialize()
    dropped = _dropped_dups(kept)
    dropped_ref = ray.put(np.array(sorted(dropped), dtype=np.int64))

    def anti(b: pa.Table) -> pa.Table:
        nd = ray.get(dropped_ref)
        ids = b.column("doc_id").to_numpy(zero_copy_only=False)
        pos = np.searchsorted(nd, ids)
        hit = pos < nd.size
        hit[hit] = nd[pos[hit]] == ids[hit]
        return b.drop(["hash_hi", "hash_lo"]).filter(pa.array(~hit))

    return kept.map_batches(anti, batch_format="pyarrow"), dropped


def curate_corpus(docs_path: str, out_dir: str,
                  rules: CurateRules = CurateRules()) -> dict:
    """Read documents parquet -> write curated (doc_id, text) parquet.

    Returns {"kept": n, "dropped_dups": n}. The writer holds NO O(corpus)
    driver state: the keep rules are a pure per-row function re-applied
    in-batch during the write pass, and the only broadcast is the dropped
    duplicate-id set (O(duplicates) by construction).
    """
    import ray
    import ray.data as rd

    docs = rd.read_parquet(docs_path, columns=["doc_id", "text"])
    signals = docs.map_batches(signal_rows, batch_format="pyarrow")

    def keep(b: pa.Table) -> pa.Table:
        return b.filter(pa.array(_rule_mask(b, rules)))

    kept = signals.map_batches(keep, batch_format="pyarrow")
    dropped = _dropped_dups(kept)
    dropped_ref = ray.put(np.array(sorted(dropped), dtype=np.int64))

    def keep_text(b: pa.Table) -> pa.Table:
        mask = _rule_mask(signal_rows(b), rules)
        nd = ray.get(dropped_ref)
        did = b.column("doc_id").to_numpy(zero_copy_only=False)
        pos = np.searchsorted(nd, did)
        hit = pos < nd.size
        hit[hit] = nd[pos[hit]] == did[hit]
        return b.filter(pa.array(mask & ~hit))

    shutil.rmtree(out_dir, ignore_errors=True)   # Ray write_parquet APPENDS
    out = docs.map_batches(keep_text, batch_format="pyarrow")
    out.write_parquet(out_dir)
    kept_n = rd.read_parquet(out_dir, columns=["doc_id"]).count()
    return {"kept": int(kept_n), "dropped_dups": len(dropped)}


def prepare_dataset(docs, rules: CurateRules = CurateRules(),
                    ngram: int = 8, select_mod: int = 97,
                    select_rem: int = 1, fractions=None, seed: int = 0,
                    budget: int = 2048):
    """The FULL training-data preparation chain, composed from the
    oracle-verified pieces:

        quality rules -> exact dedup -> benchmark decontamination
        -> eval-slice removal -> Weyl-hash split -> concat-and-chunk
        packing of the train split

    -> Dataset (doc_id, n_tokens, split, pack_id, pack_offset); non-train
    rows carry pack_id = pack_offset = -1.

    Driver state (all size-gated / small by construction): the exact-dup
    id set (O(duplicates)), the eval gram broadcast
    (stages/decontam._BCAST_GRAM_ROWS), and the contaminated-id set
    (O(contaminated docs) — benchmark overlap is rare by nature; above a
    broadcast-sized set the same anti-join runs as a hash join on a
    (doc_id, contaminated) Dataset instead).

    Decontamination is defined over the ORIGINAL corpus (the eval slice
    and its grams do not depend on which training docs survive curation),
    matching the standalone ``decontaminate`` query's oracle.
    """
    import ray

    from ..stages.chunking import pack_counts
    from ..stages.decontam import decontaminate
    from ..stages.splits import assign_split

    if fractions is None:
        fractions = {"train": 0.8, "valid": 0.1, "test": 0.1}

    curated, _dropped = curate_dataset(docs, rules)

    # contaminated ids (exact, from the oracle-verified operator)
    contam = decontaminate(docs, n=ngram, select_mod=select_mod,
                           select_rem=select_rem)
    bad = []
    for b in contam.iter_batches(batch_format="pyarrow"):
        ids = b.column("doc_id").to_numpy(zero_copy_only=False)
        flag = b.column("contaminated").to_numpy(zero_copy_only=False)
        bad.extend(ids[flag == 1].tolist())
    bad_ref = ray.put(np.array(sorted(bad), np.int64))

    def drop_eval_contam(b: pa.Table) -> pa.Table:
        nd = ray.get(bad_ref)
        ids = b.column("doc_id").to_numpy(zero_copy_only=False)
        hit = np.zeros(ids.size, bool)
        if nd.size:
            pos = np.searchsorted(nd, ids)
            ok = pos < nd.size
            hit[ok] = nd[pos[ok]] == ids[ok]
        keep = ~hit & ((ids % select_mod) != select_rem)
        return b.filter(pa.array(keep))

    surv = curated.map_batches(drop_eval_contam, batch_format="pyarrow") \
        .select_columns(["doc_id", "n_tokens"])
    sp = assign_split(surv, "doc_id", fractions, seed=seed)

    import pyarrow.compute as pc

    train = sp.map_batches(
        lambda b: b.filter(pc.equal(b.column("split"), "train")),
        batch_format="pyarrow").select_columns(["doc_id", "n_tokens"])
    packed = pack_counts(train, budget=budget)

    def tag_rest(b: pa.Table) -> pa.Table:
        neg = pa.array(np.full(b.num_rows, -1, np.int64), pa.int64())
        return pa.table({
            "doc_id": b.column("doc_id"),
            "n_tokens": b.column("n_tokens"),
            "split": b.column("split"),
            "pack_id": neg,
            "pack_offset": neg})

    rest = sp.map_batches(
        lambda b: b.filter(pc.invert(pc.equal(b.column("split"), "train"))),
        batch_format="pyarrow").map_batches(tag_rest, batch_format="pyarrow")

    def tag_train(b: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": b.column("doc_id"),
            "n_tokens": b.column("n_tokens"),
            "split": pa.array(["train"] * b.num_rows, pa.string()),
            "pack_id": b.column("pack_id"),
            "pack_offset": b.column("pack_offset")})

    return packed.map_batches(tag_train, batch_format="pyarrow").union(rest)


def prepare_manifest(docs_path: str, out_dir: str,
                     rules: CurateRules = CurateRules(),
                     fractions=None, seed: int = 0,
                     budget: int = 2048) -> dict:
    """Run :func:`prepare_dataset` over a documents parquet and write the
    layout manifest (doc_id, n_tokens, split, pack_id, pack_offset) as
    parquet partitioned by ``split`` — the artifact a training job consumes
    to stream pack_id ranges. Resumable-output conventions: fresh dir per
    run (Ray write_parquet APPENDS), one directory per split."""
    import ray.data as rd

    docs = rd.read_parquet(docs_path, columns=["doc_id", "text"])
    ds = prepare_dataset(docs, rules, fractions=fractions, seed=seed,
                         budget=budget)
    shutil.rmtree(out_dir, ignore_errors=True)
    ds.write_parquet(out_dir, partition_cols=["split"])
    out = rd.read_parquet(out_dir)
    n = out.count()
    if n == 0:
        return {"rows": 0, "train_rows": 0, "n_packs": 0}
    import pyarrow.compute as pc
    n_train = out.map_batches(
        lambda b: b.filter(pc.equal(b.column("split"), "train")),
        batch_format="pyarrow").count()
    max_pack = out.max("pack_id")
    return {"rows": int(n), "train_rows": int(n_train),
            "n_packs": int(max_pack + 1) if max_pack is not None else 0}
