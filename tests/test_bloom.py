"""Sharded Bloom-filter recrawl pre-filter (stages/bloom.py)."""
import hashlib

import numpy as np
import pyarrow as pa
import pytest

from ics_search_engine_ray.stages.bloom import (_md5_h12, bloom_build,
                                                bloom_dedup_against)

K, SHARDS = 4, 16


def _ref_flags(new_rows, old_texts, m_bits):
    """Pure-python Bloom reference (independent of the numpy kernels)."""
    m_shard = m_bits // SHARDS

    def h12(t):
        d = hashlib.md5(t.encode("utf-8")).digest()
        return (int.from_bytes(d[:8], "little"),
                int.from_bytes(d[8:], "little") | 1)

    bits = [set() for _ in range(SHARDS)]
    for t in old_texts:
        h1, h2 = h12(t)
        s = (h1 >> 48) % SHARDS
        for j in range(K):
            bits[s].add((h1 + j * h2) % (1 << 64) % m_shard)
    out = {}
    for r in new_rows:
        h1, h2 = h12(r["text"])
        s = (h1 >> 48) % SHARDS
        out[r["doc_id"]] = int(all(
            (h1 + j * h2) % (1 << 64) % m_shard in bits[s]
            for j in range(K)))
    return out


@pytest.fixture(scope="module")
def corpora(ray_session, sf_dir):
    import ray.data as rd
    old = rd.read_parquet(sf_dir + "/documents.parquet",
                          columns=["doc_id", "text"]).materialize()
    rows = old.take_all()
    new_rows = [{"doc_id": 10_000 + i,
                 "text": r["text"] if i % 3 == 0 else r["text"] + " NEW"}
                for i, r in enumerate(rows)]
    return rd.from_items(new_rows).materialize(), old, new_rows, \
        [r["text"] for r in rows]


def _flags(ds):
    t = pa.concat_tables(
        [b for b in ds.iter_batches(batch_format="pyarrow") if b.num_rows])
    return dict(zip(t.column("doc_id").to_pylist(),
                    t.column("maybe_dup").to_pylist()))


def test_matches_python_reference_and_no_false_negatives(corpora):
    new, old, new_rows, old_texts = corpora
    m_bits = 1 << 17
    got = _flags(bloom_dedup_against(new, old, m_bits=m_bits, k=K,
                                     shards=SHARDS))
    assert got == _ref_flags(new_rows, old_texts, m_bits)
    # Bloom guarantee: every true duplicate is flagged
    for i, r in enumerate(new_rows):
        if i % 3 == 0:
            assert got[r["doc_id"]] == 1


def test_forced_scale_path_equals_broadcast_path(corpora):
    new, old, _, _ = corpora
    a = _flags(bloom_dedup_against(new, old, m_bits=1 << 17))
    b = _flags(bloom_dedup_against(new, old, m_bits=1 << 17,
                                   max_filter_bytes=0))
    assert a == b


def test_tiny_filter_false_positives_are_deterministic(corpora):
    """m tiny -> heavy false positives; they must still match the
    python reference exactly (the determinism the SQL oracle relies
    on), and non-dups must flag MORE often than at a roomy m."""
    new, old, new_rows, old_texts = corpora
    m_tiny = SHARDS * 64 * 2
    got = _flags(bloom_dedup_against(new, old, m_bits=m_tiny))
    assert got == _ref_flags(new_rows, old_texts, m_tiny)
    assert len(got) == len(new_rows)
    n_flagged = sum(got.values())
    assert n_flagged > sum(1 for i in range(len(new_rows)) if i % 3 == 0)


def test_build_blob_layout(ray_session, corpora):
    _, old, _, old_texts = corpora
    m_bits = 1 << 17
    rows = bloom_build(old, m_bits=m_bits, k=K, shards=SHARDS).take_all()
    m_shard = m_bits // SHARDS
    assert all(len(r["bits"]) == m_shard // 8 for r in rows)
    # popcount equals the distinct position count per shard
    h1, h2 = _md5_h12(old_texts)
    sh = (h1 >> np.uint64(48)) % np.uint64(SHARDS)
    for r in rows:
        mask = sh == np.uint64(r["shard"])
        with np.errstate(over="ignore"):
            pos = {int((h1[i] + np.uint64(j) * h2[i]) % np.uint64(m_shard))
                   for i in np.flatnonzero(mask) for j in range(K)}
        words = np.frombuffer(r["bits"], np.uint64)
        assert int(np.unpackbits(words.view(np.uint8)).sum()) == len(pos)


def test_m_bits_validation(corpora):
    new, old, _, _ = corpora
    with pytest.raises(ValueError):
        bloom_dedup_against(new, old, m_bits=1000)  # not mult of S*64
