"""Distributed BPE tokenizer training (stages/bpe.py): textbook-example
correctness, driver-local vs distributed-path equivalence, and encoder
properties. BPE's iterative argmax is not SQL-expressible, so these
independent checks are the correctness story (no DuckDB oracle)."""

import pyarrow as pa
import pytest


def _docs(texts):
    import ray.data as rd
    return rd.from_arrow(pa.table({
        "doc_id": pa.array(list(range(1, len(texts) + 1)), pa.int64()),
        "text": pa.array(texts, pa.string())}))


def test_bpe_textbook_example(ray_session):
    # Sennrich et al. 2016 fig.1 vocabulary: low(5) lower(2) newest(6)
    # widest(3) — first merges fuse the 'est</w>' suffix.
    from ics_search_engine_ray.stages.bpe import bpe_merges
    texts = ["low " * 5 + "lower " * 2 + "newest " * 6 + "widest " * 3]
    rows = bpe_merges(_docs(texts), n_merges=4).take_all()
    got = [(r["a"], r["b"], r["n"]) for r in rows]
    assert got[0] == ("e", "s", 9)          # newest+widest
    assert got[1] == ("es", "t", 9)
    assert got[2] == ("est", "</w>", 9)
    assert rows[0]["rank"] == 0 and rows[3]["rank"] == 3


def test_bpe_local_equals_distributed(ray_session):
    from ics_search_engine_ray.stages.bpe import bpe_merges
    texts = ["the quick brown fox jumps over the lazy dog",
             "the quicker brown foxes jumped over lazy dogs",
             "pack my box with five dozen liquor jugs again",
             "the jug of liquor over the box of dogs"] * 3
    loc = [(r["rank"], r["a"], r["b"], r["n"])
           for r in bpe_merges(_docs(texts), n_merges=12).take_all()]
    dist = [(r["rank"], r["a"], r["b"], r["n"])
            for r in bpe_merges(_docs(texts), n_merges=12,
                                word_gate=0).take_all()]
    assert loc == dist and len(loc) == 12


def test_bpe_min_count_stops(ray_session):
    from ics_search_engine_ray.stages.bpe import bpe_merges
    # every word unique -> every pair count 1 -> min_count=2 stops at 0
    rows = bpe_merges(_docs(["ab cd ef"]), n_merges=10,
                      min_count=2).take_all()
    assert rows == []


def test_bpe_encode_reconstructs_and_compresses(ray_session):
    from ics_search_engine_ray.stages.bpe import (bpe_merges, encode_word,
                                                  bpe_encode)
    texts = ["streaming data engines shuffle streaming data blocks",
             "streaming shuffle data engines spill streaming blocks"] * 5
    merges = bpe_merges(_docs(texts), n_merges=30).take_all()
    ranks = {(r["a"], r["b"]): r["rank"] for r in merges}
    for w in ["streaming", "data", "shuffle", "unseenword"]:
        syms = encode_word(w, ranks)
        assert "".join(syms).replace("</w>", "") == w   # exact decode
    out = {r["doc_id"]: r for r in
           bpe_encode(_docs(texts), merges).take_all()}
    out0 = {r["doc_id"]: r for r in bpe_encode(_docs(texts), []).take_all()}
    for d in out:
        assert out[d]["n_words"] == out0[d]["n_words"] == 7
        # chars+EOW per word with no merges; strictly fewer with merges
        assert out0[d]["n_bpe_tokens"] > out[d]["n_bpe_tokens"]
        assert out[d]["n_bpe_tokens"] >= out[d]["n_words"]


def test_bpe_empty_corpus(ray_session):
    from ics_search_engine_ray.stages.bpe import bpe_merges
    assert bpe_merges(_docs([""]), n_merges=5).take_all() == []
