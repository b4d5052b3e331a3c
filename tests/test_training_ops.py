"""Tests for the training-data operators: dedup family, similarity search,
text analysis, multimodal plumbing — each against an independent driver-side
oracle (DuckDB or brute-force numpy)."""

import hashlib

import duckdb
import numpy as np
import pyarrow as pa
import pytest


@pytest.fixture(scope="module")
def docs_ds(ray_session, sf_dir):
    import ray.data as rd
    return rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])


@pytest.fixture(scope="module")
def emb_ds(ray_session, sf_dir):
    import ray.data as rd
    return rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])


def test_exact_dedup_matches_duckdb(docs_ds, sf_dir):
    from ics_search_engine_ray.stages.dedup_text import exact_dedup
    got = sorted(r["doc_id"] for r in exact_dedup(docs_ds).take_all())
    want = sorted(r[0] for r in duckdb.sql(
        f"SELECT min(doc_id) FROM '{sf_dir}/documents.parquet' GROUP BY text").fetchall())
    assert got == want


def test_minhash_estimates_jaccard(docs_ds):
    from ics_search_engine_ray.stages.dedup_text import MinHashBatch, _shingles
    mh = MinHashBatch(n_perm=256, shingle_k=3)
    a = "the quick brown fox jumps over the lazy dog again and again today"
    b = "the quick brown fox jumps over the lazy cat again and again today"
    sa, sb = mh.signature(a), mh.signature(b)
    est = float((sa == sb).mean())
    wa, wb = set(_shingles(a.split(), 3)), set(_shingles(b.split(), 3))
    true_j = len(wa & wb) / len(wa | wb)
    assert abs(est - true_j) < 0.15


def test_minhash_dedup_catches_near_identical(ray_session):
    import ray.data as rd
    from ics_search_engine_ray.stages.dedup_text import minhash_dedup
    base = " ".join(f"w{i}" for i in range(100))
    rows = [
        {"doc_id": 1, "text": base},
        {"doc_id": 2, "text": base},                               # exact
        {"doc_id": 3, "text": base + " extra"},                    # near
        {"doc_id": 4, "text": " ".join(f"z{i}" for i in range(100))},  # distinct
    ]
    ds = rd.from_items(rows)
    survivors_ds, dropped, n_pairs = minhash_dedup(ds, threshold=0.8)
    survivors = sorted(r["doc_id"] for r in survivors_ds.take_all())
    assert 1 in survivors and 4 in survivors
    assert 2 in dropped and 3 in dropped


def test_char_entropy_known_values(ray_session):
    """Pinned entropies: uniform 2-char doc = 1 bit, one-char doc = +0.0
    (not -0.0 — the value hash distinguishes bit patterns), empty = 0/0,
    4-char uniform = 2 bits."""
    import math
    import struct

    import ray.data as rd
    from ics_search_engine_ray.stages.text_analysis import (
        char_entropy_dataset)
    rows = [
        {"doc_id": 1, "text": "abab"},      # p=.5/.5 -> 1 bit
        {"doc_id": 2, "text": "aaaa"},      # 0 bits, must be +0.0
        {"doc_id": 3, "text": ""},
        {"doc_id": 4, "text": "abcd"},      # 2 bits
        {"doc_id": 5, "text": "aab"},       # 2/3,1/3
    ]
    out = {r["doc_id"]: r for r in
           char_entropy_dataset(rd.from_items(rows)).take_all()}
    assert out[1]["entropy"] == 1.0 and out[1]["distinct_chars"] == 2
    assert out[2]["entropy"] == 0.0 and out[2]["distinct_chars"] == 1
    assert struct.pack("<d", out[2]["entropy"]) == struct.pack("<d", 0.0)
    assert out[3]["entropy"] == 0.0 and out[3]["distinct_chars"] == 0
    assert out[4]["entropy"] == 2.0 and out[4]["distinct_chars"] == 4
    expect = -(2 / 3 * math.log2(2 / 3) + 1 / 3 * math.log2(1 / 3))
    assert abs(out[5]["entropy"] - round(expect, 6)) < 1e-12


def test_minhash_band_pairs_relation(ray_session):
    """Deterministic LSH-pair relation: exact dup pairs appear with
    est=1.0, distinct docs don't pair, docs with no words are excluded
    (the sentinel filter) instead of spuriously pairing with each other,
    and each pair appears once despite multi-band rediscovery."""
    import ray.data as rd
    from ics_search_engine_ray.stages.dedup_text import minhash_band_pairs
    base = " ".join(f"w{i}" for i in range(100))
    rows = [
        {"doc_id": 1, "text": base},
        {"doc_id": 2, "text": base},                               # exact
        {"doc_id": 4, "text": " ".join(f"z{i}" for i in range(100))},
        {"doc_id": 5, "text": ""},                                 # no words
        {"doc_id": 6, "text": "   "},                              # no words
    ]
    out = minhash_band_pairs(rd.from_items(rows), threshold=0.5).take_all()
    pairs = {(r["a"], r["b"]): r["est"] for r in out}
    assert len(out) == len(pairs)          # one row per pair
    assert pairs == {(1, 2): 1.0}          # exact dup; 5/6 filtered


def test_ngram_jaccard_pairs_exact(ray_session):
    import ray.data as rd
    from ics_search_engine_ray.stages.dedup_text import ngram_jaccard_pairs, _shingles
    base = " ".join(f"w{i}" for i in range(50))
    rows = [
        {"doc_id": 1, "text": base},
        {"doc_id": 2, "text": base + " tail"},
        {"doc_id": 3, "text": "completely different content here"},
    ]
    pairs = ngram_jaccard_pairs(rd.from_items(rows), n=3, threshold=0.8)
    assert [(a, b) for a, b, _ in pairs] == [(1, 2)]
    wa = set(_shingles(base.split(), 3))
    wb = set(_shingles((base + " tail").split(), 3))
    assert pairs[0][2] == pytest.approx(len(wa & wb) / len(wa | wb), abs=1e-6)


def test_knn_brute_matches_numpy(emb_ds, sf_dir):
    from ics_search_engine_ray.stages.similarity import knn_brute
    import pyarrow.parquet as pq
    t = pq.read_table(f"{sf_dir}/embeddings.parquet")
    ids = np.array(t.column("vec_id").to_pylist())
    mat = np.array(t.column("embedding").to_pylist(), dtype=np.float64)
    matn = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    q = matn[list(ids).index(0)]
    sims = matn @ q
    order = np.lexsort((ids, -sims))[:10]
    want = [(int(ids[i]), float(sims[i])) for i in order]
    got = knn_brute(emb_ds, q[None, :], k=10)[0]
    assert [g[0] for g in got] == [w[0] for w in want]
    for g, w in zip(got, want):
        assert g[1] == pytest.approx(w[1], abs=1e-9)


def test_knn_lsh_recall(emb_ds, sf_dir):
    from ics_search_engine_ray.stages.similarity import knn_brute, knn_lsh
    import pyarrow.parquet as pq
    t = pq.read_table(f"{sf_dir}/embeddings.parquet")
    q = np.array(t.column("embedding")[0].as_py(), dtype=np.float64)
    exact = {v for v, _ in knn_brute(emb_ds, q[None, :], k=10)[0]}
    # near-orthogonal random embeddings are the hard case for hyperplane LSH:
    # wide tables (few bits, many tables) trade candidate volume for recall
    approx = {v for v, _ in knn_lsh(emb_ds, q[None, :], k=10, n_bits=4, n_tables=16)[0]}
    assert len(exact & approx) >= 6


def test_embedding_dedup_finds_known_pair(ray_session):
    import ray.data as rd
    from ics_search_engine_ray.stages.dedup_text import embedding_dedup
    rng = np.random.default_rng(0)
    vecs = rng.standard_normal((50, 16))
    vecs[7] = vecs[3] + rng.standard_normal(16) * 0.01      # near-dup pair
    rows = [{"vec_id": i, "embedding": vecs[i].tolist()} for i in range(50)]
    pairs = embedding_dedup(rd.from_items(rows), threshold=0.99, n_bits=8, n_tables=8)
    assert (3, 7) in [(a, b) for a, b, _ in pairs]


def test_quality_and_tokens_match_duckdb(docs_ds, sf_dir):
    from ics_search_engine_ray.stages.text_analysis import (
        token_count_dataset, quality_dataset)
    got = {r["doc_id"]: r["n_tokens"] for r in token_count_dataset(docs_ds).take_all()}
    want = dict(duckdb.sql(
        f"""SELECT doc_id, len(list_filter(regexp_extract_all(lower(text),'[a-z0-9]+'),
            x -> length(x) > 1)) FROM '{sf_dir}/documents.parquet'""").fetchall())
    assert got == {k: int(v) for k, v in want.items()}
    q = {r["doc_id"]: r for r in quality_dataset(docs_ds).take_all()}
    w = duckdb.sql(
        f"""SELECT doc_id, length(text), len(string_split_regex(trim(text), '\\s+'))
            FROM '{sf_dir}/documents.parquet'""").fetchall()
    for did, nc, nw in w:
        assert q[did]["n_chars"] == nc
        assert q[did]["n_words"] == nw


def test_fingerprint_md5(docs_ds, sf_dir):
    from ics_search_engine_ray.stages.text_analysis import fingerprint_dataset
    rows = fingerprint_dataset(docs_ds).take_all()
    import pyarrow.parquet as pq
    texts = dict(zip(
        pq.read_table(f"{sf_dir}/documents.parquet").column("doc_id").to_pylist(),
        pq.read_table(f"{sf_dir}/documents.parquet").column("text").to_pylist()))
    for r in rows[:50]:
        assert r["md5"] == hashlib.md5(texts[r["doc_id"]].encode()).hexdigest()
    # rolling hash: deterministic and order-sensitive
    h = {r["doc_id"]: r["rolling_hash"] for r in rows}
    assert len(set(h.values())) > 400


def test_langid_deterministic_and_english_seed(ray_session):
    import ray.data as rd
    from ics_search_engine_ray.stages.text_analysis import langid_dataset
    rows = [
        {"doc_id": 1, "text": "the quick brown fox and the lazy dog are common words in this test"},
        {"doc_id": 2, "text": "der schnelle braune fuchs springt über den faulen hund und dies ist"},
        {"doc_id": 3, "text": ""},
    ]
    got = {r["doc_id"]: r["lang_pred"] for r in langid_dataset(rd.from_items(rows)).take_all()}
    assert got[1] == "en"
    assert got[2] == "de"
    assert got[3] == "und"


# held-out labeled sentences (NOT drawn from the profile word lists): the
# pinned accuracy bound for the upgraded frequent-word byte-trigram
# classifier (r3 verdict item 6). The sv/da/no triangle is the documented
# honest cap — written Danish and Norwegian Bokmål are near-identical, so
# within that triangle any of the three is accepted; everything else must
# be exact.
_LANGID_HELDOUT = {
    "en": ["she said that they would come back home before the evening meal was ready",
           "we have been looking at the results and there is nothing more to do now"],
    "de": ["wir haben gestern über die neuen ergebnisse gesprochen und sind noch nicht fertig",
           "das kind wollte nicht in die schule gehen weil es draußen so schön war"],
    "fr": ["nous avons parlé hier de ces nouveaux résultats et nous ne sommes pas encore prêts",
           "elle voulait rentrer à la maison avant que la nuit ne tombe sur la ville"],
    "es": ["hemos hablado ayer de estos nuevos resultados y todavía no estamos listos",
           "el niño no quería ir a la escuela porque hacía mucho sol en la calle"],
    "it": ["abbiamo parlato ieri di questi nuovi risultati e non siamo ancora pronti",
           "il bambino non voleva andare a scuola perché fuori c'era il sole"],
    "pt": ["falamos ontem sobre estes novos resultados e ainda não estamos prontos",
           "o menino não queria ir à escola porque fazia muito sol na rua"],
    "nl": ["wij hebben gisteren over deze nieuwe resultaten gesproken en zijn nog niet klaar",
           "het kind wilde niet naar school gaan omdat het buiten zo mooi weer was"],
    "sv": ["vi pratade igår om dessa nya resultat och vi är inte färdiga ännu",
           "barnet ville inte gå till skolan eftersom det var så vackert väder ute"],
    "da": ["vi talte i går om disse nye resultater og vi er ikke færdige endnu",
           "barnet ville ikke gå i skole fordi vejret var så dejligt udenfor"],
    "no": ["vi snakket i går om disse nye resultatene og vi er ikke ferdige ennå",
           "barnet ville ikke gå på skolen fordi været var så fint ute"],
    "fi": ["puhuimme eilen näistä uusista tuloksista emmekä ole vielä valmiita",
           "lapsi ei halunnut mennä kouluun koska ulkona oli niin kaunis sää"],
    "pl": ["rozmawialiśmy wczoraj o tych nowych wynikach i nie jesteśmy jeszcze gotowi",
           "dziecko nie chciało iść do szkoły bo na dworze była piękna pogoda"],
    "ro": ["am vorbit ieri despre aceste rezultate noi și nu suntem încă gata",
           "copilul nu voia să meargă la școală pentru că afară era foarte frumos"],
    "tr": ["dün bu yeni sonuçlar hakkında konuştuk ve henüz hazır değiliz",
           "çocuk okula gitmek istemiyordu çünkü dışarıda hava çok güzeldi"],
    "id": ["kemarin kami berbicara tentang hasil baru ini dan kami belum siap",
           "anak itu tidak mau pergi ke sekolah karena cuaca di luar sangat bagus"],
}

_SCANDI = {"sv", "da", "no"}


def test_langid_heldout_accuracy():
    from ics_search_engine_ray.stages.text_analysis import LangIdBatch
    rows, labels = [], []
    for lang, sents in _LANGID_HELDOUT.items():
        for s in sents:
            rows.append(s)
            labels.append(lang)
    out = LangIdBatch()(pa.table({
        "doc_id": pa.array(range(len(rows)), pa.int64()),
        "text": pa.array(rows, pa.string())}))
    pred = out.column("lang_pred").to_pylist()
    conf = out.column("lang_conf").to_pylist()
    n_ok = 0
    for p, l in zip(pred, labels):
        if l in _SCANDI:
            assert p in _SCANDI, f"{l} drifted outside the Scandinavian triangle: {p}"
        else:
            assert p == l, f"expected {l}, got {p}"
        n_ok += p == l
    assert n_ok / len(labels) >= 0.9          # pinned overall accuracy bound
    assert all(c > 0.0 for c in conf)          # every sentence scored


def test_multimodal_pipeline_plumbing(docs_ds):
    from ics_search_engine_ray.stages.multimodal import (
        synth_media_from_documents, media_features_dataset, FEATURE_DIM, RealDecoder)
    media = synth_media_from_documents(docs_ds)
    feats = media_features_dataset(media, batch_size=16)
    rows = feats.take(5)
    for r in rows:
        assert r["kind"] in ("image", "audio")
        assert len(r["feature"]) == 32
        assert len(r["sha16"]) == 16
    with pytest.raises(NotImplementedError):
        RealDecoder().decode(b"x", "image")


def test_simhash_dedup_reference_greedy_semantics(ray_session):
    """Chain A~B~C with A!~C: reference greedy (in doc_id order) keeps A and
    C, drops only B — unlike min-per-cluster which would drop B and C."""
    import ray.data as rd
    from ics_search_engine_ray.stages.dedup import simhash_dedup
    from ics_search_engine_ray.config import DEFAULT_CONFIG

    bits = np.zeros(128, dtype=np.uint8)
    fa = np.packbits(bits).tobytes()
    bits_b = bits.copy(); bits_b[:12] = 1          # d(A,B)=12 <= 19
    fb = np.packbits(bits_b).tobytes()
    bits_c = bits.copy(); bits_c[12:36] = 1        # d(B,C)=36? no...
    # construct: d(A,B)=12, d(B,C)=14, d(A,C)=26 (> 19)
    bits_c = bits_b.copy()
    bits_c[12:26] = 1                              # flip 14 more
    fc = np.packbits(bits_c).tobytes()
    ds = rd.from_items([
        {"doc_id": 1, "simhash": fa},
        {"doc_id": 2, "simhash": fb},
        {"doc_id": 3, "simhash": fc},
    ])
    res = simhash_dedup(ds, DEFAULT_CONFIG)
    assert res.dropped == {2}


def test_simhash_banding_exact_across_band_configs(ray_session):
    """Candidate generation must be EXACT for both regimes: classic 20-band
    exact-match banding (radius 0) and 10 wide bands with flip-down probing
    (radius 1) — both must find precisely the brute-force within-threshold
    pair set on random fingerprints with planted near-dups."""
    import ray.data as rd
    from ics_search_engine_ray.config import DEFAULT_CONFIG
    from ics_search_engine_ray.stages.dedup import simhash_dedup

    rng = np.random.default_rng(13)
    n = 300
    base = rng.integers(0, 256, size=(n, 16), dtype=np.uint8)
    # plant near-dup partners: flip <=19 random bits of some rows
    for i in range(0, n, 7):
        j = (i + 1) % n
        bits = np.unpackbits(base[i])
        flips = rng.choice(128, size=rng.integers(1, 20), replace=False)
        bits[flips] ^= 1
        base[j] = np.packbits(bits)
    fps = [base[i].tobytes() for i in range(n)]
    ds = rd.from_items([{"doc_id": i, "simhash": fps[i]} for i in range(n)])

    # brute force within-threshold pairs
    bits = np.unpackbits(base, axis=1).astype(np.int16)
    ham = (bits[:, None, :] != bits[None, :, :]).sum(axis=2)
    want = {(i, j) for i in range(n) for j in range(i + 1, n)
            if ham[i, j] <= DEFAULT_CONFIG.max_hamming}

    results = {}
    for bands, bcast in ((20, True), (10, True), (20, False), (10, False)):
        cfg = DEFAULT_CONFIG.with_(simhash_bands=bands)
        res = simhash_dedup(ds, cfg, broadcast_fp=bcast)
        assert res.num_pairs == len(want), (bands, bcast)
        results[(bands, bcast)] = (frozenset(res.dropped),
                                   tuple(tuple(c) for c in res.clusters))
    assert len(set(results.values())) == 1     # all four modes identical


def test_knn_ivf_recall_and_exact_degenerate(emb_ds, sf_dir):
    from ics_search_engine_ray.stages.similarity import knn_brute, knn_ivf
    import pyarrow.parquet as pq
    t = pq.read_table(f"{sf_dir}/embeddings.parquet")
    q = np.array(t.column("embedding")[0].as_py(), dtype=np.float64)
    exact = knn_brute(emb_ds, q[None, :], k=10)[0]
    # n_probe == n_lists probes everything -> must EQUAL brute force
    full = knn_ivf(emb_ds, q[None, :], k=10, n_lists=8, n_probe=8)[0]
    assert [(v, round(c, 9)) for v, c in full] == \
           [(v, round(c, 9)) for v, c in exact]
    # partial probing: reasonable recall on near-orthogonal random vectors
    approx = knn_ivf(emb_ds, q[None, :], k=10, n_lists=16, n_probe=6)[0]
    got = {v for v, _ in approx}
    want = {v for v, _ in exact}
    assert len(got & want) >= 5
    # multi-query shape
    q2 = np.stack([q, np.array(t.column("embedding")[1].as_py())])
    multi = knn_ivf(emb_ds, q2, k=5, n_lists=8, n_probe=8)
    assert len(multi) == 2 and all(len(m) == 5 for m in multi)


def test_ivf_assign_persistable(emb_ds):
    from ics_search_engine_ray.stages.similarity import _kmeans, _normalize, ivf_assign
    rows = emb_ds.take(64)
    smat = _normalize(np.array([r["embedding"] for r in rows], dtype=np.float64))
    cent = _kmeans(smat, 4)
    assigned = ivf_assign(emb_ds, cent)
    got = assigned.take(20)
    assert all(0 <= r["list_id"] < 4 for r in got)


def test_cosine_pairs_exact_matches_numpy(emb_ds, sf_dir):
    from ics_search_engine_ray.stages.similarity import cosine_pairs_exact
    import pyarrow.parquet as pq
    t = pq.read_table(f"{sf_dir}/embeddings.parquet")
    ids = np.array(t.column("vec_id").to_pylist())
    mat = np.array(t.column("embedding").to_pylist(), dtype=np.float64)
    matn = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    sim = matn @ matn.T
    want = sorted((int(min(ids[i], ids[j])), int(max(ids[i], ids[j])),
                   round(float(sim[i, j]), 6))
                  for i in range(len(ids)) for j in range(i + 1, len(ids))
                  if sim[i, j] >= 0.4 - 1e-12)
    got = cosine_pairs_exact(emb_ds, threshold=0.4)
    assert got == want


def test_frame_sampling_and_resize_plumbing(docs_ds):
    from ics_search_engine_ray.stages.multimodal import (
        synth_video_from_documents, frame_sample_dataset,
        synth_media_from_documents, resize_images_dataset,
        FrameSampler, ImageResizer)
    import hashlib as _h

    video = synth_video_from_documents(docs_ds, width=8, height=8, n_frames=12)
    frames = frame_sample_dataset(video, every_n=5)
    rows = frames.take(30)
    # every video contributes frames 0, 5, 10
    by_media = {}
    for r in rows:
        by_media.setdefault(r["media_id"], []).append(r["frame_idx"])
        assert len(r["frame"]) == 64
        assert r["sha16"] == _h.sha256(r["frame"]).hexdigest()[:16]
    assert all(sorted(v) == [0, 5, 10] for v in by_media.values() if len(v) == 3)
    # real decode path is explicitly stubbed
    with pytest.raises(NotImplementedError):
        FrameSampler(real=True)._frames(b"x", 8, 8, 2)

    media = synth_media_from_documents(docs_ds)
    small = resize_images_dataset(media, out_w=4, out_h=4)
    rrows = small.take(10)
    assert all(len(r["payload"]) == 16 and r["width"] == 4 for r in rrows)
    # the real path resizes PPM containers for real now; non-PPM image
    # codecs still raise (they need PIL)
    import pyarrow as _pa
    jpeg_like = _pa.table({
        "media_id": _pa.array([1], _pa.int64()),
        "kind": _pa.array(["image"], _pa.string()),
        "payload": _pa.array([b"\xff\xd8\xff\xe0JFIF"], _pa.binary())})
    with pytest.raises(NotImplementedError):
        ImageResizer(real=True)(jpeg_like)
    from ics_search_engine_ray.stages.multimodal import PpmWavDecoder
    ppm = _pa.table({
        "media_id": _pa.array([2], _pa.int64()),
        "kind": _pa.array(["image"], _pa.string()),
        "payload": _pa.array(
            [b"P6\n8 8\n255\n" + bytes(range(192))], _pa.binary())})
    out = ImageResizer(4, 4, real=True)(ppm)
    px = PpmWavDecoder().parse_ppm(out.column("payload")[0].as_py())
    src = PpmWavDecoder().parse_ppm(ppm.column("payload")[0].as_py())
    assert (px == src[::2, ::2]).all()      # nearest-neighbour 8->4


def test_exact_dedup_min_doc_id_by_fingerprint(ray_session):
    import ray.data as rd
    from ics_search_engine_ray.stages.dedup import exact_dedup_min_doc_id
    fa, fb = b"\x01" * 16, b"\x02" * 16
    ds = rd.from_items([{"doc_id": 5, "simhash": fa},
                        {"doc_id": 2, "simhash": fa},
                        {"doc_id": 9, "simhash": fb}])
    got = sorted((r["doc_id"] for r in exact_dedup_min_doc_id(ds).take_all()))
    assert got == [2, 9]


def test_cosine_pairs_tiled_equals_broadcast(emb_ds):
    """The scale-path (tiled block-pair join) must produce exactly the
    broadcast path's pairs; tiny tile_rows forces many tiles + both the
    triangle and cross group kinds."""
    from ics_search_engine_ray.stages.similarity import cosine_pairs_exact
    bcast = cosine_pairs_exact(emb_ds, threshold=0.4, broadcast=True)
    tiled = cosine_pairs_exact(emb_ds, threshold=0.4, broadcast=False,
                               tile_rows=7)
    assert tiled == bcast
    assert len(bcast) > 0          # non-vacuous at this threshold


def test_knn_ivf_empty_corpus(ray_session):
    import ray.data as rd
    from ics_search_engine_ray.stages.similarity import knn_ivf, knn_lsh
    empty = rd.from_arrow(pa.table({
        "vec_id": pa.array([], pa.int64()),
        "embedding": pa.array([], pa.list_(pa.float64()))}))
    q = np.ones((2, 8))
    assert knn_ivf(empty, q, k=5) == [[], []]
    assert knn_lsh(empty, q, k=5) == [[], []]


def test_adaptive_groups_bounds_group_size(ray_session):
    """Shuffle-group counts must scale with the input so per-task group rows
    stay bounded as replication grows (fixed constants were VERDICT r2 item
    2); outputs are G-invariant."""
    import ray.data as rd
    from ics_search_engine_ray.stages.common import adaptive_groups
    from ics_search_engine_ray.stages.dedup_text import minhash_dedup

    target = 50_000
    for est in (1, 10_000, 1_000_000, 50_000_000, 10**12):
        g = adaptive_groups(est, target, lo=64)
        if g < 4096:                       # below the hi clamp
            assert est / g <= target
        assert 64 <= g <= 4096
    # monotone: 100x input never reduces parallelism
    assert adaptive_groups(10**9, target) >= adaptive_groups(10**7, target)

    # output invariance: adaptive G == pinned G on a real corpus
    base = " ".join(f"w{i}" for i in range(60))
    rows = [{"doc_id": 1, "text": base},
            {"doc_id": 2, "text": base + " tail"},
            {"doc_id": 3, "text": " ".join(f"q{i}" for i in range(60))}]
    ds = rd.from_items(rows)
    _, d_auto, p_auto = minhash_dedup(ds, threshold=0.8)
    _, d_pin, p_pin = minhash_dedup(ds, threshold=0.8, num_verify_groups=7)
    assert d_auto == d_pin and p_auto == p_pin


def test_ngram_hot_shingle_chunk_split(ray_session):
    """A boilerplate shingle shared by every doc must yield IDENTICAL pairs
    whether or not the hot-shingle chunk-pair split engages (VERDICT r2 item
    7): the split is pure work decomposition — each shared shingle still
    emits its doc pair exactly once, so Jaccard counts stay exact."""
    import ray.data as rd
    from ics_search_engine_ray.stages.dedup_text import ngram_jaccard_pairs

    boiler = "the quick brown fox jumps over the lazy dogs daily"
    rows = [{"doc_id": i, "text": boiler + f" unique{i} tok{i} end{i}"}
            for i in range(40)]
    rows.append({"doc_id": 100, "text": boiler + " same tail here now"})
    rows.append({"doc_id": 101, "text": boiler + " same tail here now x"})
    ds = rd.from_items(rows)

    base = ngram_jaccard_pairs(ds, n=3, threshold=0.3)
    # force discovery (full sample) + tiny chunks so the boiler shingles
    # split into many chunk-pair units with real cross emissions
    split = ngram_jaccard_pairs(ds, n=3, threshold=0.3,
                                hot_gate_rows=1, chunk_rows=4,
                                sample_frac=1.0)
    assert len(base) > 0
    assert split == base


def test_label_centroids_matches_numpy(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd
    from ics_search_engine_ray.stages.similarity import label_centroids

    rng = np.random.default_rng(37)
    n, d = 400, 16
    labels = rng.integers(0, 6, n)
    mat = rng.standard_normal((n, d)).astype(np.float32)
    ds = rd.from_arrow(pa.table({
        "label": pa.array(labels, pa.int32()),
        "embedding": pa.array([list(map(float, r)) for r in mat],
                              pa.list_(pa.float32())),
    })).repartition(5)
    got = {(r["label"], r["dim"]): r["v"]
           for r in label_centroids(ds).take_all()}
    for lb in np.unique(labels):
        want = np.round(
            mat[labels == lb].astype(np.float64).mean(axis=0), 6)
        for j in range(d):
            assert got[(lb, j + 1)] == pytest.approx(want[j], abs=1e-9)


def test_unigram_surprisal_matches_numpy(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd
    from collections import Counter
    from ics_search_engine_ray.functions.tokenizer import TOKEN_RE
    from ics_search_engine_ray.stages.text_analysis import unigram_surprisal

    texts = ["the cat sat on the mat", "cat cat dog", "", "a",  # 0-token docs
             "unique words appear once here", "the the the dog sat"]
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })).repartition(3)
    got = {r["doc_id"]: r["avg_nll"]
           for r in unigram_surprisal(ds).take_all()}

    toks = [[t for t in TOKEN_RE.findall(x.lower()) if len(t) > 1]
            for x in texts]
    c = Counter(t for p in toks for t in p)
    total = sum(c.values())
    for i, p in enumerate(toks):
        if not p:
            assert i not in got
            continue
        want = round(float(np.mean([-np.log(c[t] / total) for t in p])), 6)
        assert got[i] == pytest.approx(want, abs=1e-9)


def test_doc_tfidf_topk_matches_bruteforce(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd
    from collections import Counter
    from ics_search_engine_ray.functions.tokenizer import TOKEN_RE
    from ics_search_engine_ray.stages.text_analysis import doc_tfidf_topk

    rng = np.random.default_rng(53)
    vocab = [f"w{i}" for i in range(12)]
    texts = [" ".join(rng.choice(vocab, size=rng.integers(3, 30)))
             for _ in range(60)] + ["", "zz"]
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })).repartition(4)
    got = sorted((r["doc_id"], r["rank"], r["term"], r["tfidf"])
                 for r in doc_tfidf_topk(ds, k=3).take_all())

    toks = [[t for t in TOKEN_RE.findall(x.lower()) if len(t) > 1]
            for x in texts]
    df = Counter(t for p in toks for t in set(p))
    nd = sum(1 for p in toks if p)
    want = []
    for i, p in enumerate(toks):
        if not p:
            continue
        tf = Counter(p)
        scored = sorted(((-tf[t] * np.log(nd / df[t]), t) for t in tf))
        for rk, (neg, t) in enumerate(scored[:3]):
            want.append((i, rk + 1, t, round(-neg, 6)))
    assert got == sorted(want)


def test_association_pairs_matches_bruteforce(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd
    from collections import Counter
    from ics_search_engine_ray.functions.tokenizer import TOKEN_RE
    from ics_search_engine_ray.stages.text_analysis import association_pairs

    rng = np.random.default_rng(59)
    vocab = [f"w{i}" for i in range(8)]
    texts = [" ".join(rng.choice(vocab, size=rng.integers(1, 7)))
             for _ in range(120)] + ["", "q"]
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })).repartition(5)
    mc = 8
    got = sorted((r["a"], r["b"], r["n_ab"], r["lift"])
                 for r in association_pairs(ds, min_count=mc).take_all())

    sets = [{t for t in TOKEN_RE.findall(x.lower()) if len(t) > 1}
            for x in texts]
    nd = sum(1 for s in sets if s)
    dfc = Counter(t for s in sets for t in s)
    pc = Counter()
    for s in sets:
        ss = sorted(s)
        for i, a in enumerate(ss):
            for b in ss[i + 1:]:
                pc[(a, b)] += 1
    want = sorted((a, b, n, round(n * nd / (dfc[a] * dfc[b]), 6))
                  for (a, b), n in pc.items() if n >= mc)
    assert got == want


def test_bigram_counts_matches_duckdb(docs_ds, sf_dir):
    from ics_search_engine_ray.stages.text_analysis import bigram_counts
    got = sorted((r["a"], r["b"], r["n"])
                 for r in bigram_counts(docs_ds, min_count=5).take_all())
    want = sorted(duckdb.sql(f"""
WITH toks AS (SELECT doc_id, list_filter(regexp_extract_all(lower(text),
              '[a-z0-9]+'), x -> length(x) > 1) AS l
              FROM '{sf_dir}/documents.parquet'),
big AS (SELECT unnest(list_zip(l[1:len(l)-1], l[2:len(l)])) AS z
        FROM toks WHERE len(l) >= 2)
SELECT z[1], z[2], count(*) FROM big GROUP BY 1, 2
HAVING count(*) >= 5""").fetchall())
    assert got == want and len(got) > 0


def test_bigram_counts_boundaries(ray_session):
    """Bigrams never cross document boundaries; single-token and empty
    docs emit none; min_count filter is exact."""
    import ray.data as rd
    from ics_search_engine_ray.stages.text_analysis import bigram_counts
    rows = (["aa bb"] * 3) + ["bb", "", "aa", "x aa bb"]  # x dropped (len 1)
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(rows)), pa.int64()),
        "text": pa.array(rows, pa.string())})).repartition(3)
    got = sorted((r["a"], r["b"], r["n"])
                 for r in bigram_counts(ds, min_count=2).take_all())
    assert got == [("aa", "bb", 4)]


def test_normalize_text_matches_duckdb(docs_ds, sf_dir):
    from ics_search_engine_ray.config import STOP_WORDS
    from ics_search_engine_ray.stages.text_analysis import normalize_text
    got = sorted((r["doc_id"], r["norm_text"], r["n_kept"])
                 for r in normalize_text(docs_ds).take_all())
    stop = ", ".join("'" + w.replace("'", "''") + "'"
                     for w in sorted(STOP_WORDS))
    want = sorted(duckdb.sql(f"""
WITH toks AS (SELECT doc_id, list_filter(regexp_extract_all(lower(text),
              '[a-z0-9]+'), x -> length(x) > 1 AND x NOT IN ({stop})) AS tk
              FROM '{sf_dir}/documents.parquet')
SELECT doc_id, array_to_string(tk, ' '), CAST(len(tk) AS BIGINT)
FROM toks""").fetchall())
    assert got == want


def test_balance_sources_matches_duckdb(ray_session, sf_dir):
    import ray.data as rd
    from ics_search_engine_ray.stages.text_analysis import balance_sources
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "source"])
    got = sorted((r["doc_id"], r["source"])
                 for r in balance_sources(ds, seed=7).take_all())
    want = sorted(duckdb.sql(f"""
WITH cnt AS (SELECT source, count(*) AS c
             FROM '{sf_dir}/documents.parquet' GROUP BY source),
mn AS (SELECT min(c) AS m FROM cnt),
thr AS (SELECT source, (m * 4294967296) // c AS t FROM cnt CROSS JOIN mn)
SELECT d.doc_id, d.source FROM '{sf_dir}/documents.parquet' d
JOIN thr USING (source)
WHERE ((d.doc_id + 7) * 2654435761) % 4294967296 < thr.t""").fetchall())
    assert got == want and 0 < len(got)


def test_balance_sources_equalizes(ray_session):
    """A 10x-overrepresented source downsamples to ~ the smallest."""
    import ray.data as rd
    from collections import Counter
    from ics_search_engine_ray.stages.text_analysis import balance_sources
    n_small, n_big = 200, 2000
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(n_small + n_big), pa.int64()),
        "source": pa.array(["s"] * n_small + ["b"] * n_big, pa.string()),
    })).repartition(4)
    kept = Counter(r["source"] for r in balance_sources(ds).take_all())
    assert kept["s"] == n_small                       # smallest: keep all... almost
    assert abs(kept["b"] - n_small) < 4 * np.sqrt(n_small)


def test_kmeans_matches_local_lloyds(emb_ds):
    from ics_search_engine_ray.stages.similarity import (
        kmeans_assign, kmeans_fit, _normalize)
    k, iters = 4, 6
    rows = emb_ds.take_all()
    ids = np.array([r["vec_id"] for r in rows], np.int64)
    mat = np.array([r["embedding"] for r in rows], np.float64)

    cent = _normalize(mat[:k].copy())
    for _ in range(iters):
        assign = np.argmax(_normalize(mat) @ cent.T, axis=1)
        new = cent.copy()
        for c in range(k):
            m = mat[assign == c]
            if m.shape[0]:
                new[c] = m.mean(axis=0)
        cent = _normalize(new)

    got_cent = kmeans_fit(emb_ds, k=k, iters=iters)
    assert np.allclose(got_cent, cent, atol=1e-9)

    want_assign = dict(zip(ids.tolist(),
                           np.argmax(_normalize(mat) @ cent.T,
                                     axis=1).tolist()))
    got = {r["vec_id"]: r["cluster"]
           for r in kmeans_assign(emb_ds, k=k, iters=iters).take_all()}
    assert got == want_assign


def test_ngram_counts_matches_duckdb(docs_ds, sf_dir):
    from ics_search_engine_ray.stages.text_analysis import ngram_counts
    got = sorted((r["gram"], r["n"])
                 for r in ngram_counts(docs_ds, n=3, min_count=5).take_all())
    want = sorted(duckdb.sql(f"""
WITH toks AS (SELECT doc_id, list_filter(regexp_extract_all(lower(text),
              '[a-z0-9]+'), x -> length(x) > 1) AS l
              FROM '{sf_dir}/documents.parquet'),
g AS (SELECT unnest(list_transform(range(1, len(l) - 1),
      i -> l[i] || ' ' || l[i+1] || ' ' || l[i+2])) AS gram
      FROM toks WHERE len(l) >= 3)
SELECT gram, count(*) FROM g GROUP BY gram
HAVING count(*) >= 5""").fetchall())
    assert got == want and len(got) > 0


def test_ngram_counts_short_docs_and_bigram_parity(ray_session):
    """Docs shorter than n emit nothing (no whole-doc fallback leaks);
    n=2 agrees with bigram_counts exactly."""
    import ray.data as rd
    from ics_search_engine_ray.stages.text_analysis import (
        bigram_counts, ngram_counts)
    rows = (["aa bb cc"] * 3) + ["aa bb", "cc", "", "dd aa bb cc dd"]
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(rows)), pa.int64()),
        "text": pa.array(rows, pa.string())})).repartition(3)
    got3 = sorted((r["gram"], r["n"])
                  for r in ngram_counts(ds, n=3, min_count=2).take_all())
    assert got3 == [("aa bb cc", 4)]
    got2 = sorted((r["gram"], r["n"])
                  for r in ngram_counts(ds, n=2, min_count=1).take_all())
    want2 = sorted((f'{r["a"]} {r["b"]}', r["n"])
                   for r in bigram_counts(ds, min_count=1).take_all())
    assert got2 == want2


def test_similar_docs_matches_duckdb(docs_ds, sf_dir):
    from ics_search_engine_ray.stages.text_analysis import similar_docs
    got = [(r["doc_id"], r["cos"])
           for r in similar_docs(docs_ds, query_doc_id=7, k=10).take_all()]
    want = duckdb.sql(f"""
WITH toks AS (SELECT doc_id, unnest(list_filter(regexp_extract_all(
              lower(text), '[a-z0-9]+'), x -> length(x) > 1)) AS term
              FROM '{sf_dir}/documents.parquet'),
tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term),
df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
nd AS (SELECT count(DISTINCT doc_id) AS n FROM tf),
w AS (SELECT tf.doc_id, tf.term,
             tf.tf * ln((SELECT n FROM nd) * 1.0 / df.df) AS w
      FROM tf JOIN df USING (term)),
qv AS (SELECT term, w FROM w WHERE doc_id = 7),
qn AS (SELECT sqrt(sum(w * w)) AS qnorm FROM qv),
norms AS (SELECT doc_id, sqrt(sum(w * w)) AS nrm FROM w GROUP BY doc_id),
dots AS (SELECT w.doc_id, sum(w.w * qv.w) AS d FROM w JOIN qv USING (term)
         WHERE w.doc_id != 7 GROUP BY w.doc_id)
SELECT dots.doc_id, round(dots.d / (norms.nrm * (SELECT qnorm FROM qn)), 6)
FROM dots JOIN norms ON dots.doc_id = norms.doc_id
WHERE dots.d > 0 ORDER BY 2 DESC, dots.doc_id LIMIT 10""").fetchall()
    assert got == [(d, c) for d, c in want] and len(got) == 10


def test_similar_docs_empty_query(ray_session):
    import ray.data as rd
    from ics_search_engine_ray.stages.text_analysis import similar_docs
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": pa.array(["aa bb cc", "", "aa bb dd", "ee ff"],
                         pa.string())}))
    # empty-text query doc and absent query doc both yield empty results
    assert similar_docs(ds, query_doc_id=2).take_all() == []
    assert similar_docs(ds, query_doc_id=99).take_all() == []
    got = similar_docs(ds, query_doc_id=1, k=5).take_all()
    # doc 3 shares aa/bb (idf > 0 since doc 4 lacks them); 2 and 4 don't
    assert [r["doc_id"] for r in got] == [3]


def test_prefix_terms_matches_duckdb(docs_ds, sf_dir):
    from ics_search_engine_ray.stages.text_analysis import prefix_terms
    got = [(r["term"], r["df"])
           for r in prefix_terms(docs_ds, prefix="s", k=10).take_all()]
    want = duckdb.sql(f"""
SELECT term, count(DISTINCT doc_id) AS df
FROM (SELECT doc_id, unnest(list_filter(regexp_extract_all(lower(text),
      '[a-z0-9]+'), x -> length(x) > 1)) AS term
      FROM '{sf_dir}/documents.parquet')
WHERE term LIKE 's%' GROUP BY term ORDER BY df DESC, term
LIMIT 10""").fetchall()
    assert sorted(got) == sorted((t, int(d)) for t, d in want)
    assert got == sorted(got, key=lambda x: (-x[1], x[0]))  # rank order


# ---------------- window-unit (paragraph) dedup ----------------


_PD_SQL = """
WITH toks AS (SELECT doc_id, list_filter(regexp_extract_all(lower(text),
              '[a-z0-9]+'), x -> length(x) > 1) AS tk FROM documents),
ch AS (SELECT doc_id, i AS cidx,
              array_to_string(tk[CAST(i*{W}+1 AS INT):CAST(i*{W}+{W} AS INT)],
                              ' ') AS chunk,
              CAST(ceil(len(tk) / {W}.0) AS BIGINT) AS nch
       FROM (SELECT doc_id, tk,
                    unnest(range(0, CAST(ceil(len(tk) / {W}.0) AS BIGINT))) AS i
             FROM toks WHERE len(tk) > 0)),
surv AS (SELECT doc_id, cidx, chunk, nch,
                row_number() OVER (PARTITION BY chunk
                                   ORDER BY doc_id, cidx) AS rn FROM ch)
SELECT doc_id, string_agg(chunk, ' ' ORDER BY cidx) AS text,
       CAST(max(nch) AS BIGINT) AS n_chunks,
       CAST(max(nch) - count(*) AS BIGINT) AS n_dropped
FROM surv WHERE rn = 1 GROUP BY doc_id ORDER BY doc_id
"""


def test_paragraph_dedup_matches_duckdb(docs_ds, sf_dir):
    from ics_search_engine_ray.stages.dedup_text import paragraph_dedup
    got = sorted(
        ((r["doc_id"], r["text"], r["n_chunks"], r["n_dropped"])
         for r in paragraph_dedup(docs_ds, win=20).take_all()))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS "
                f"SELECT * FROM '{sf_dir}/documents.parquet'")
    want = [tuple(r) for r in con.execute(_PD_SQL.format(W=20)).fetchall()]
    assert got == want


def test_paragraph_dedup_keep_first(ray_session):
    import ray.data as rd
    from ics_search_engine_ray.stages.dedup_text import paragraph_dedup
    # win=3: doc 1 = [A][B], doc 2 = [B][C], doc 3 = [A] + short tail [D]
    A, B, C, D = "aa bb cc", "dd ee ff", "gg hh ii", "jj kk"
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array([f"{A} {B}", f"{B} {C}", f"{A} {D}"]),
    }))
    out = {r["doc_id"]: r for r in paragraph_dedup(docs, win=3).take_all()}
    assert out[1]["text"] == f"{A} {B}" and out[1]["n_dropped"] == 0
    assert out[2]["text"] == C and out[2]["n_dropped"] == 1
    assert out[3]["text"] == D and out[3]["n_dropped"] == 1
    assert out[3]["n_chunks"] == 2       # short tail chunk counted


def test_paragraph_dedup_all_dropped_doc_vanishes(ray_session):
    import ray.data as rd
    from ics_search_engine_ray.stages.dedup_text import paragraph_dedup
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array([5, 9, 7], pa.int64()),
        "text": pa.array(["aa bb cc", "aa bb cc", ""]),
    }))
    rows = paragraph_dedup(docs, win=3).take_all()
    # doc 9's only chunk is doc 5's; doc 7 has no tokens -> both vanish
    assert [r["doc_id"] for r in rows] == [5]


_BP_SQL = """
WITH toks AS (SELECT doc_id, source,
              list_filter(regexp_extract_all(lower(text),
              '[a-z0-9]+'), x -> length(x) > 1) AS tk FROM documents),
ch AS (SELECT doc_id, source, i AS cidx,
              array_to_string(tk[CAST(i*{W}+1 AS INT):CAST(i*{W}+{W} AS INT)],
                              ' ') AS chunk,
              CAST(ceil(len(tk) / {W}.0) AS BIGINT) AS nch
       FROM (SELECT doc_id, source, tk,
                    unnest(range(0, CAST(ceil(len(tk) / {W}.0) AS BIGINT))) AS i
             FROM toks WHERE len(tk) > 0)),
cnt AS (SELECT source, chunk, count(DISTINCT doc_id) AS ndoc
        FROM ch GROUP BY source, chunk),
surv AS (SELECT ch.doc_id, ch.cidx, ch.chunk, ch.nch
         FROM ch JOIN cnt USING (source, chunk) WHERE cnt.ndoc < {M})
SELECT doc_id, string_agg(chunk, ' ' ORDER BY cidx) AS text,
       CAST(max(nch) AS BIGINT) AS n_chunks,
       CAST(max(nch) - count(*) AS BIGINT) AS n_dropped
FROM surv GROUP BY doc_id ORDER BY doc_id
"""


def test_boilerplate_remove_matches_duckdb(ray_session, sf_dir):
    import ray.data as rd
    from ics_search_engine_ray.stages.dedup_text import boilerplate_remove
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text", "source"])
    got = sorted(
        ((r["doc_id"], r["text"], r["n_chunks"], r["n_dropped"])
         for r in boilerplate_remove(docs, win=20, min_docs=2).take_all()))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS "
                f"SELECT * FROM '{sf_dir}/documents.parquet'")
    want = [tuple(r) for r in con.execute(
        _BP_SQL.format(W=20, M=2)).fetchall()]
    assert got == want


def test_boilerplate_drops_all_copies_within_source(ray_session):
    import ray.data as rd
    from ics_search_engine_ray.stages.dedup_text import boilerplate_remove
    NAV, X, Y = "aa bb cc", "dd ee ff", "gg hh ii"
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array([f"{NAV} {X}", f"{NAV} {Y}", f"{NAV} {Y}"]),
        "source": pa.array(["s1", "s1", "s2"]),
    }))
    out = {r["doc_id"]: r for r in
           boilerplate_remove(docs, win=3, min_docs=2).take_all()}
    # NAV repeats across docs 1+2 of s1: ALL s1 copies drop, s2's survives;
    # repetition within a single doc would NOT trip the distinct-doc rule
    assert out[1]["text"] == X and out[1]["n_dropped"] == 1
    assert out[2]["text"] == Y and out[2]["n_dropped"] == 1
    assert out[3]["text"] == f"{NAV} {Y}" and out[3]["n_dropped"] == 0


def test_similar_docs_index_df_equals_corpus_df(docs_ds, sf_dir, tmp_path):
    """index_dir path (df/N from the built index's term dictionaries —
    r3 verdict item 7) must reproduce the corpus-df path exactly,
    including salted-head df handling via manifest head_df."""
    from ics_search_engine_ray.pipelines.build import (DEFAULT_CONFIG,
                                                       build_index_from_texts)
    from ics_search_engine_ray.stages.text_analysis import (_index_term_df,
                                                            similar_docs)
    out = str(tmp_path / "idx")
    cfg = DEFAULT_CONFIG.with_(stem=False)
    build_index_from_texts(f"{sf_dir}/documents.parquet", out, cfg,
                           skip_dedup=True)
    base = [(r["doc_id"], r["cos"])
            for r in similar_docs(docs_ds, query_doc_id=7, k=10).take_all()]
    idx = [(r["doc_id"], r["cos"])
           for r in similar_docs(docs_ds, query_doc_id=7, k=10,
                                 index_dir=out).take_all()]
    assert base == idx and len(idx) == 10
    # the df relation itself matches DuckDB's (head terms not overcounted)
    rel, n_docs = _index_term_df(out)
    got = sorted((r["term"], r["df"]) for r in rel.take_all())
    want = sorted(duckdb.sql(f"""
SELECT term, count(DISTINCT doc_id) FROM (
  SELECT doc_id, unnest(list_filter(regexp_extract_all(lower(text),
         '[a-z0-9]+'), x -> length(x) > 1)) AS term
  FROM '{sf_dir}/documents.parquet') GROUP BY term""").fetchall())
    assert got == want
    assert n_docs == duckdb.sql(
        f"SELECT count(*) FROM '{sf_dir}/documents.parquet' "
        "WHERE len(list_filter(regexp_extract_all(lower(text), '[a-z0-9]+'),"
        " x -> length(x) > 1)) > 0").fetchone()[0]


def test_source_stats_counts_within_source_dups(ray_session):
    import ray.data as rd
    from ics_search_engine_ray.stages.text_analysis import source_stats
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "text": pa.array(["aa bb cc", "aa bb cc", "dd ee",
                          "aa bb cc", ""]),
        "source": pa.array(["s1", "s1", "s1", "s2", "s2"]),
    }))
    out = {r["source"]: r for r in source_stats(docs).take_all()}
    # s1: docs 1+2 share text -> 1 dup; s2's copy of the same text is
    # counted against s2 only (0 dups there); empty text counts 0 tokens
    assert out["s1"]["n_docs"] == 3 and out["s1"]["n_dup_docs"] == 1
    assert out["s1"]["sum_tokens"] == 8
    assert out["s2"]["n_docs"] == 2 and out["s2"]["n_dup_docs"] == 0
    assert out["s2"]["sum_tokens"] == 3
    assert out["s2"]["avg_doclen"] == 1.5


def test_temperature_resample_sqrt_law_and_duckdb(ray_session):
    import math

    import ray.data as rd
    from ics_search_engine_ray.stages.text_analysis import (
        temperature_resample)
    # skewed sources: 1600 / 400 / 100 docs
    sizes = {"big": 1600, "mid": 400, "sml": 100}
    ids, srcs = [], []
    i = 0
    for s, n in sizes.items():
        for _ in range(n):
            ids.append(i)
            srcs.append(s)
            i += 1
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "source": pa.array(srcs, pa.string())}))
    kept = temperature_resample(docs.map_batches(
        lambda b: b, batch_format="pyarrow"), seed=7).take_all()
    by = {}
    for r in kept:
        by[r["source"]] = by.get(r["source"], 0) + 1
    # min group keeps everything; others keep ~ n * sqrt(n_min/n)
    assert by["sml"] == 100
    for s in ("big", "mid"):
        expect = sizes[s] * math.sqrt(100 / sizes[s])
        assert abs(by[s] - expect) / expect < 0.25, (s, by[s], expect)
    # exact membership parity with the HUGEINT SQL comparison
    con = duckdb.connect()
    con.register("documents", pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "source": pa.array(srcs, pa.string())}))
    want = sorted(con.execute("""
WITH cnt AS (SELECT source, count(*) AS c FROM documents GROUP BY source),
mn AS (SELECT min(c) AS m FROM cnt),
thr AS (SELECT source,
        (CAST(m AS HUGEINT) * CAST(18446744073709551616 AS HUGEINT)) // c
        AS t FROM cnt CROSS JOIN mn)
SELECT d.doc_id FROM documents d JOIN thr USING (source)
WHERE CAST(((d.doc_id + 7) * 2654435761) % 4294967296 AS HUGEINT)
      * (((d.doc_id + 7) * 2654435761) % 4294967296) < thr.t
""").fetchall())
    got = sorted((r["doc_id"],) for r in kept)
    assert got == want
