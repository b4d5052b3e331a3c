"""Curation pipeline (pipelines/curate.py): rule filter + exact dedup of
survivors + resumable curated-corpus writer. The SQL-parity half is covered
by the driver oracle (`curate` in __ray_entry__); these tests pin the
composition semantics on a corpus with injected duplicates and rule
violations."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


GOOD = ("the quick brown fox jumps over the lazy dog and then runs far "
        "away into the green forest to find some tasty food for dinner")


def _docs_table():
    rows = [
        (0, GOOD),                               # kept
        (1, GOOD + " extra words here also"),    # kept, distinct
        (2, GOOD),                               # exact dup of 0 -> dropped
        (3, "short text"),                       # too few words
        (4, " ".join(["12345"] * 40)),           # all digits -> digit_ratio
        (5, " ".join(["the"] * 40)),             # stopword_ratio 1.0
        (6, GOOD),                               # exact dup of 0 -> dropped
        (7, GOOD.replace("fox", "wolf")),        # kept, distinct
    ]
    return pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
    })


def test_curate_dataset_rules_and_dedup(ray_session):
    import ray.data as rd
    from ics_search_engine_ray.pipelines.curate import curate_dataset

    curated, dropped = curate_dataset(rd.from_arrow(_docs_table()).repartition(3))
    got = {r["doc_id"]: r for b in curated.iter_batches(batch_format="pyarrow")
           for r in b.to_pylist()}
    assert set(got) == {0, 1, 7}
    assert dropped == {2, 6}
    assert got[0]["n_words"] == len(GOOD.split())
    assert 0.0 < got[0]["stopword_ratio"] < 0.8
    # signal columns present and rounded
    assert got[1]["mean_word_len"] == round(got[1]["mean_word_len"], 6)


def test_curate_corpus_writer(ray_session, tmp_path):
    from ics_search_engine_ray.pipelines.curate import curate_corpus

    src = os.path.join(tmp_path, "docs.parquet")
    pq.write_table(_docs_table(), src)
    out = os.path.join(tmp_path, "curated")
    res = curate_corpus(src, out)
    assert res == {"kept": 3, "dropped_dups": 2}
    back = pq.read_table(out)
    assert sorted(back.column("doc_id").to_pylist()) == [0, 1, 7]
    assert set(back.column("text").to_pylist()) == {
        GOOD, GOOD + " extra words here also", GOOD.replace("fox", "wolf")}
    # second run overwrites (Ray write_parquet appends without the rmtree)
    res2 = curate_corpus(src, out)
    assert res2["kept"] == 3
    assert pq.read_table(out).num_rows == 3


def test_prepare_manifest_writer(ray_session, tmp_path, sf_dir):
    """prep CLI surface: manifest written partitioned by split, packs
    contiguous within the train split, rewrite replaces (no append)."""
    import os
    from ics_search_engine_ray.pipelines.curate import prepare_manifest

    out = os.path.join(tmp_path, "prep")
    res = prepare_manifest(f"{sf_dir}/documents.parquet", out, budget=512)
    assert res["rows"] > 0 and res["train_rows"] > 0
    assert sorted(d for d in os.listdir(out) if d.startswith("split=")) == [
        "split=test", "split=train", "split=valid"]
    res2 = prepare_manifest(f"{sf_dir}/documents.parquet", out, budget=512)
    assert res2 == res                       # rewrite, not append
    import ray.data as rd
    rows = sorted((r["doc_id"], r["n_tokens"], r["pack_id"], r["pack_offset"])
                  for r in rd.read_parquet(out + "/split=train").take_all())
    pos = 0
    for _, nt, pid, poff in rows:
        assert pid * 512 + poff == pos
        pos += nt
