"""Text-analysis operators for large-scale training-data pipelines.

Beyond the reference's own surface (task brief): language ID (n-gram
heuristic), quality scoring, token counting, and document fingerprinting —
each as a vectorized ``map_batches`` stage over the ``documents`` table
(doc_id, text, ...).

Definitions are kept exactly SQL-expressible where an oracle exists
(__ray_entry__.oracle_sql), so the driver can verify them with DuckDB.
"""

from __future__ import annotations

import hashlib
import re
from typing import Dict, List

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.tokenizer import TOKEN_RE, Tokenizer
from ..config import STOP_WORDS

# ---------------- token counting ----------------


def token_count_batch(batch: pa.Table) -> pa.Table:
    """n_tokens = count of [a-zA-Z0-9]+ runs of length>1 in lowercased text
    (identical to reference token_count semantics: tokenize then drop
    single-char tokens; Porter never shrinks a token below 2 chars)."""
    texts = batch.column("text").to_pylist()
    counts = [sum(1 for t in TOKEN_RE.findall((x or "").lower()) if len(t) > 1)
              for x in texts]
    return pa.table({
        "doc_id": batch.column("doc_id"),
        "n_tokens": pa.array(counts, pa.int64()),
    })


def token_count_dataset(docs):
    return docs.map_batches(token_count_batch, batch_format="pyarrow")


# ---------------- quality scoring ----------------


def quality_batch(batch: pa.Table) -> pa.Table:
    """Quality signals (all SQL-replicable): char count, word count
    (whitespace split), mean word length, stopword ratio, digit ratio."""
    texts = [x or "" for x in batch.column("text").to_pylist()]
    n_chars, n_words, mean_wl, stop_ratio, digit_ratio = [], [], [], [], []
    for x in texts:
        words = x.split()
        nw = len(words)
        n_chars.append(len(x))
        n_words.append(nw)
        mean_wl.append(round(sum(len(w) for w in words) / nw, 6) if nw else 0.0)
        stop_ratio.append(round(sum(1 for w in words if w.lower() in STOP_WORDS) / nw, 6) if nw else 0.0)
        # ASCII [0-9] only: str.isdigit() is true for Unicode digits ('²','٣'),
        # which the SQL oracle's regexp [^0-9] does not count
        digit_ratio.append(round(sum(1 for ch in x if "0" <= ch <= "9") / len(x), 6) if x else 0.0)
    return pa.table({
        "doc_id": batch.column("doc_id"),
        "n_chars": pa.array(n_chars, pa.int64()),
        "n_words": pa.array(n_words, pa.int64()),
        "mean_word_len": pa.array(mean_wl, pa.float64()),
        "stopword_ratio": pa.array(stop_ratio, pa.float64()),
        "digit_ratio": pa.array(digit_ratio, pa.float64()),
    })


def quality_dataset(docs):
    return docs.map_batches(quality_batch, batch_format="pyarrow")


# ---------------- fingerprinting ----------------


def fingerprint_batch(batch: pa.Table) -> pa.Table:
    """md5 content fingerprint (hex) + a 64-bit rolling (polynomial) hash
    over the whitespace token stream (Rabin-Karp style, base 257 mod 2^61-1)."""
    texts = [x or "" for x in batch.column("text").to_pylist()]
    md5s = [hashlib.md5(x.encode("utf-8")).hexdigest() for x in texts]
    MOD = (1 << 61) - 1
    BASE = 257
    rolls = []
    for x in texts:
        h = 0
        for w in x.split():
            wh = int.from_bytes(hashlib.md5(w.encode()).digest()[:8], "big")
            h = (h * BASE + wh) % MOD
        rolls.append(h)
    return pa.table({
        "doc_id": batch.column("doc_id"),
        "md5": pa.array(md5s, pa.string()),
        "rolling_hash": pa.array(rolls, pa.int64()),
    })


def fingerprint_dataset(docs):
    return docs.map_batches(fingerprint_batch, batch_format="pyarrow")


# ---------------- language ID ----------------

# character-trigram profiles for a handful of languages, built from small
# public-knowledge seed phrases (deterministic, self-contained heuristic —
# a real deployment would plug a fastText-style model into this same stage)
_LANG_SEEDS: Dict[str, str] = {
    "en": "the quick brown fox jumps over the lazy dog and this is a test of the english language with many words that are common",
    "de": "der schnelle braune fuchs springt über den faulen hund und dies ist ein test der deutschen sprache mit vielen wörtern",
    "fr": "le renard brun rapide saute par dessus le chien paresseux et ceci est un test de la langue française avec beaucoup de mots",
    "es": "el rápido zorro marrón salta sobre el perro perezoso y esto es una prueba del idioma español con muchas palabras comunes",
    "it": "la rapida volpe marrone salta sopra il cane pigro e questo è una prova della lingua italiana con molte parole comuni che sono",
    "pt": "a rápida raposa marrom pula sobre o cão preguiçoso e isto é um teste da língua portuguesa com muitas palavras comuns que são",
    "nl": "de snelle bruine vos springt over de luie hond en dit is een test van de nederlandse taal met veel woorden die vaak voorkomen",
    "sv": "den snabba bruna räven hoppar över den lata hunden och detta är ett test av det svenska språket med många vanliga ord som finns",
}


def _trigrams(s: str) -> Dict[str, int]:
    s = re.sub(r"\s+", " ", s.lower())
    out: Dict[str, int] = {}
    for i in range(len(s) - 2):
        g = s[i:i + 3]
        out[g] = out.get(g, 0) + 1
    return out


class LangIdBatch:
    """Actor-pool stage: trigram cosine against per-language profiles
    (profiles built once per actor in __init__)."""

    def __init__(self):
        # languages sorted so np.argmax's first-max rule == the documented
        # lexicographically-smallest tie-break; profile matrix (L, V) over
        # the union trigram vocabulary, L2-normalized per language
        self.langs = sorted(_LANG_SEEDS)
        profs = []
        vocab: Dict[str, int] = {}
        for lang in self.langs:
            tg = _trigrams(_LANG_SEEDS[lang])
            norm = np.sqrt(sum(v * v for v in tg.values()))
            profs.append({k: v / norm for k, v in tg.items()})
            for k in tg:
                vocab.setdefault(k, len(vocab))
        self.vocab = vocab
        self.mat = np.zeros((len(self.langs), len(vocab)))
        for i, prof in enumerate(profs):
            for k, v in prof.items():
                self.mat[i, vocab[k]] = v

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = [x or "" for x in batch.column("text").to_pylist()]
        langs, confs = [], []
        for x in texts:
            tg = _trigrams(x[:2000])
            if not tg:
                langs.append("und")
                confs.append(0.0)
                continue
            norm = np.sqrt(sum(v * v for v in tg.values()))
            idx = [self.vocab[k] for k in tg if k in self.vocab]
            if idx:
                cnt = np.fromiter((tg[k] for k in tg if k in self.vocab),
                                  dtype=np.float64, count=len(idx))
                scores = self.mat[:, idx] @ cnt / norm   # one kernel, all langs
            else:
                scores = np.zeros(len(self.langs))
            bi = int(np.argmax(scores))
            langs.append(self.langs[bi])
            confs.append(round(float(scores[bi]), 6))
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "lang_pred": pa.array(langs, pa.string()),
            "lang_conf": pa.array(confs, pa.float64()),
        })


def langid_dataset(docs, concurrency=(1, 4)):
    return docs.map_batches(LangIdBatch, batch_format="pyarrow",
                            concurrency=concurrency)


# ---------------- unigram LM surprisal ----------------


def unigram_surprisal(docs, vocab_gate: int = 2_000_000):
    """Per-document mean negative log-likelihood under the corpus's own
    unigram LM — the classic cheap LM-quality signal (low = stereotyped
    boilerplate, high = rare-token noise; both tails get filtered in
    curation).

    Two streaming passes like heavy_hitters: (1) global term counts via
    per-batch combiners into a tiny vocabulary groupby; the (term, count)
    relation broadcasts once below ``vocab_gate``; (2) each batch maps
    tokens -> -ln(count/total) with one searchsorted and reduces per doc
    with one reduceat. Docs with zero tokens are excluded (matching the
    SQL oracle's inner join). Scale path above the gate: hash-join tokens
    against the count relation instead of broadcasting (SCALE.md).

    Returns (doc_id, avg_nll DOUBLE rounded 6).
    """
    import ray

    src = docs.select_columns(["doc_id", "text"])

    def local_counts(b: pa.Table) -> pa.Table:
        texts = b.column("text").to_pylist()
        toks = [t for x in texts
                for t in TOKEN_RE.findall((x or "").lower())
                if len(t) > 1]
        if not toks:
            return pa.table({"term": pa.array([], pa.string()),
                             "c": pa.array([], pa.int64())})
        uniq, cnt = np.unique(np.asarray(toks, object), return_counts=True)
        return pa.table({"term": pa.array(uniq, pa.string()),
                         "c": pa.array(cnt.astype(np.int64), pa.int64())})

    def merge_counts(g: pa.Table) -> pa.Table:
        t = g.column("term").to_numpy(zero_copy_only=False)
        c = g.column("c").to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(t, return_inverse=True)
        sums = np.bincount(inv, weights=c).astype(np.int64)
        return pa.table({"term": pa.array(uniq, pa.string()),
                         "c": pa.array(sums, pa.int64())})

    cnt_rows = src.map_batches(local_counts, batch_format="pyarrow") \
        .map_batches(
            lambda b: b.append_column("_g", pa.array([0] * b.num_rows,
                                                     pa.int8())),
            batch_format="pyarrow") \
        .groupby("_g").map_groups(lambda g: merge_counts(g.drop(["_g"])),
                                  batch_format="pyarrow").take_all()
    if len(cnt_rows) > vocab_gate:
        raise ValueError(
            f"vocabulary {len(cnt_rows)} exceeds broadcast gate "
            f"{vocab_gate}; use the hash-join path (SCALE.md)")
    vocab = np.asarray([r["term"] for r in cnt_rows], object)
    counts = np.asarray([r["c"] for r in cnt_rows], np.int64)
    order = np.argsort(vocab)
    vocab, counts = vocab[order], counts[order]
    total = int(counts.sum())
    nll = -np.log(counts.astype(np.float64) / total)
    lm_ref = ray.put((vocab, nll))

    def score(b: pa.Table) -> pa.Table:
        v, logp = ray.get(lm_ref)
        texts = b.column("text").to_pylist()
        ids = b.column("doc_id").to_numpy(zero_copy_only=False)
        per_doc = [[t for t in TOKEN_RE.findall((x or "").lower())
                    if len(t) > 1] for x in texts]
        lens = np.array([len(p) for p in per_doc], np.int64)
        keep = lens > 0
        if not keep.any():
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "avg_nll": pa.array([], pa.float64())})
        flat = np.asarray([t for p in per_doc for t in p], object)
        pos = np.searchsorted(v, flat)
        vals = logp[np.clip(pos, 0, v.size - 1)]
        offs = np.concatenate(([0], np.cumsum(lens)))[:-1][keep]
        sums = np.add.reduceat(vals, offs)
        means = np.round(sums / lens[keep], 6)
        return pa.table({
            "doc_id": pa.array(ids[keep].astype(np.int64), pa.int64()),
            "avg_nll": pa.array(means, pa.float64())})

    return src.map_batches(score, batch_format="pyarrow")


# ---------------- per-doc top-k tf-idf terms ----------------


def doc_tfidf_topk(docs, k: int = 5, vocab_gate: int = 2_000_000):
    """Top-k tf-idf terms per document (plain-token semantics: the same
    [a-z0-9]+ len>1 tokens the SQL oracles use; tfidf = tf * ln(N/df),
    N = docs with >=1 token).

    Pass 1 builds (df, N) with per-batch distinct-pair combiners — a doc
    lives wholly in one batch, so per-batch distinct (doc, term) pairs
    are globally distinct and df partials just sum. The idf table
    broadcasts below ``vocab_gate`` (scale path: hash-join term->idf).
    Pass 2 is fully batch-local: tf via one lexsort + segment counts,
    then the per-doc top-k with the same sorted-run rank trick as
    top_k_per_group. Ties break on term ascending, matching the oracle's
    row_number ORDER BY.
    """
    import ray

    src = docs.select_columns(["doc_id", "text"])

    rows = src.map_batches(_df_partial, batch_format="pyarrow") \
        .map_batches(
            lambda b: b.append_column("_g", pa.array([0] * b.num_rows,
                                                     pa.int8())),
            batch_format="pyarrow") \
        .groupby("_g").map_groups(
            lambda g: _merge_df(g.drop(["_g"])),
            batch_format="pyarrow").take_all()
    if len(rows) > vocab_gate:
        raise ValueError(f"vocabulary {len(rows)} exceeds broadcast gate")
    vocab = np.asarray([r["term"] for r in rows], object)
    dfs = np.asarray([r["df"] for r in rows], np.float64)
    n_docs = int(rows[0]["nd"]) if rows else 0
    order = np.argsort(vocab)
    vocab, dfs = vocab[order], dfs[order]
    idf = np.log(n_docs / dfs) if n_docs else dfs
    lm_ref = ray.put((vocab, idf))

    def topk(b: pa.Table) -> pa.Table:
        empty = pa.table({"doc_id": pa.array([], pa.int64()),
                          "term": pa.array([], pa.string()),
                          "tfidf": pa.array([], pa.float64()),
                          "rank": pa.array([], pa.int64())})
        v, w = ray.get(lm_ref)
        texts = b.column("text").to_pylist()
        ids = b.column("doc_id").to_numpy(zero_copy_only=False)
        per_doc = [[t for t in TOKEN_RE.findall((x or "").lower())
                    if len(t) > 1] for x in texts]
        lens = np.array([len(p) for p in per_doc], np.int64)
        if not lens.sum():
            return empty
        flat = np.asarray([t for p in per_doc for t in p], object)
        tidx = np.searchsorted(v, flat)
        di = np.repeat(np.arange(len(per_doc)), lens)
        # tf: one sort over (doc, term) then segment counts
        order = np.lexsort((tidx, di))
        di, tidx = di[order], tidx[order]
        newseg = np.concatenate(
            ([True], (di[1:] != di[:-1]) | (tidx[1:] != tidx[:-1])))
        starts = np.flatnonzero(newseg)
        tf = np.diff(np.append(starts, di.size)).astype(np.float64)
        gd, gt = di[starts], tidx[starts]
        score = tf * w[gt]
        # per-doc top-k by (score desc, term asc): terms are sorted asc
        # within a doc already, so a stable sort on -score keeps term order
        order2 = np.argsort(-score, kind="stable")
        order2 = order2[np.argsort(gd[order2], kind="stable")]
        gd2 = gd[order2]
        dstarts = np.flatnonzero(
            np.concatenate(([True], gd2[1:] != gd2[:-1])))
        rank = np.arange(gd2.size) - np.repeat(
            dstarts, np.diff(np.append(dstarts, gd2.size)))
        keep = rank < k
        sel = order2[keep]
        return pa.table({
            "doc_id": pa.array(ids[gd[sel]].astype(np.int64), pa.int64()),
            "term": pa.array(v[gt[sel]], pa.string()),
            "tfidf": pa.array(np.round(score[sel], 6), pa.float64()),
            "rank": pa.array((rank[keep] + 1).astype(np.int64),
                             pa.int64())})

    return src.map_batches(topk, batch_format="pyarrow")


def _df_partial(b: pa.Table) -> pa.Table:
    """Per-batch distinct-(doc, term) df combiner shared by
    doc_tfidf_topk and association_pairs; the batch's doc count rides
    row 0 of ``nd`` (summed by :func:`_merge_df`)."""
    texts = b.column("text").to_pylist()
    terms, ndocs = [], 0
    for x in texts:
        s = {t for t in TOKEN_RE.findall((x or "").lower())
             if len(t) > 1}
        if s:
            ndocs += 1
            terms.extend(s)
    if not terms:
        return pa.table({"term": pa.array([], pa.string()),
                         "df": pa.array([], pa.int64()),
                         "nd": pa.array([], pa.int64())})
    uniq, cnt = np.unique(np.asarray(terms, object), return_counts=True)
    nd = np.zeros(uniq.size, np.int64)
    nd[0] = ndocs
    return pa.table({"term": pa.array(uniq, pa.string()),
                     "df": pa.array(cnt.astype(np.int64), pa.int64()),
                     "nd": pa.array(nd, pa.int64())})


def _merge_df(g: pa.Table) -> pa.Table:
    t = g.column("term").to_numpy(zero_copy_only=False)
    d = g.column("df").to_numpy(zero_copy_only=False)
    nd_total = int(g.column("nd").to_numpy(zero_copy_only=False).sum())
    uniq, inv = np.unique(t, return_inverse=True)
    sums = np.bincount(inv, weights=d).astype(np.int64)
    nd = np.full(uniq.size, nd_total, np.int64)
    return pa.table({"term": pa.array(uniq, pa.string()),
                     "df": pa.array(sums, pa.int64()),
                     "nd": pa.array(nd, pa.int64())})


# ---------------- more-like-this: sparse tf-idf cosine ----------------


def similar_docs(docs, query_doc_id: int, k: int = 10,
                 vocab_gate: int = 2_000_000):
    """More-like-this: top-k documents by sparse tf-idf cosine to ONE
    query document (the related-documents feature of a search engine),
    -> (doc_id, cos), cos = <w_q, w_d> / (|w_q||w_d|), w = tf * ln(N/df)
    over the SQL-replicable token stream, query doc excluded, only docs
    sharing >= 1 term emitted, ties (rounded cos) break on doc_id.

    Pass 1 reuses the distinct-pair df combiners; the idf table
    broadcasts below ``vocab_gate`` (scale path: hash-join term->idf).
    The query doc's weight vector is a dense-over-vocab float array
    riding the same broadcast (8 B x vocab). Pass 2 is ONE batch-local
    pass: tf via lexsort segments, per-doc dot and norm via two
    bincounts, then a per-batch top-k partial — only batches x k rows
    reach the driver merge (knn_brute pattern), never the corpus.
    """
    import ray

    src = docs.select_columns(["doc_id", "text"])

    rows = src.map_batches(_df_partial, batch_format="pyarrow") \
        .map_batches(
            lambda b: b.append_column("_g", pa.array([0] * b.num_rows,
                                                     pa.int8())),
            batch_format="pyarrow") \
        .groupby("_g").map_groups(
            lambda g: _merge_df(g.drop(["_g"])),
            batch_format="pyarrow").take_all()
    empty = pa.table({"doc_id": pa.array([], pa.int64()),
                      "cos": pa.array([], pa.float64())})
    import ray.data as rd
    if not rows:
        return rd.from_arrow(empty)
    if len(rows) > vocab_gate:
        raise ValueError(f"vocabulary {len(rows)} exceeds broadcast gate")
    vocab = np.asarray([r["term"] for r in rows], object)
    dfs = np.asarray([r["df"] for r in rows], np.float64)
    n_docs = int(rows[0]["nd"])
    order = np.argsort(vocab)
    vocab, dfs = vocab[order], dfs[order]
    idf = np.log(n_docs / dfs)

    qrows = src.map_batches(
        lambda b: b.filter(pc.equal(b.column("doc_id"), query_doc_id)),
        batch_format="pyarrow").take_all()
    qtoks = [t for t in TOKEN_RE.findall(
        (qrows[0]["text"] or "").lower()) if len(t) > 1] if qrows else []
    if not qtoks:
        return rd.from_arrow(empty)
    qterms, qtf = np.unique(np.asarray(qtoks, object), return_counts=True)
    qpos = np.searchsorted(vocab, qterms)            # query terms ARE in vocab
    qw = np.zeros(vocab.size, np.float64)
    qw[qpos] = qtf * idf[qpos]
    qnorm = float(np.sqrt((qw ** 2).sum()))
    ref = ray.put((vocab, idf, qw))

    def partial(b: pa.Table) -> pa.Table:
        v, w_idf, qvec = ray.get(ref)
        texts = b.column("text").to_pylist()
        ids = b.column("doc_id").to_numpy(zero_copy_only=False)
        per_doc = [[t for t in TOKEN_RE.findall((x or "").lower())
                    if len(t) > 1] for x in texts]
        lens = np.array([len(p) for p in per_doc], np.int64)
        if not lens.sum():
            return empty
        flat = np.asarray([t for p in per_doc for t in p], object)
        tidx = np.searchsorted(v, flat)
        di = np.repeat(np.arange(len(per_doc)), lens)
        o = np.lexsort((tidx, di))
        di, tidx = di[o], tidx[o]
        newseg = np.concatenate(
            ([True], (di[1:] != di[:-1]) | (tidx[1:] != tidx[:-1])))
        starts = np.flatnonzero(newseg)
        tf = np.diff(np.append(starts, di.size)).astype(np.float64)
        gd, gt = di[starts], tidx[starts]
        w = tf * w_idf[gt]
        nb = len(per_doc)
        dots = np.bincount(gd, w * qvec[gt], minlength=nb)
        norms = np.sqrt(np.bincount(gd, w * w, minlength=nb))
        keep = (dots > 0) & (ids != query_doc_id)
        if not keep.any():
            return empty
        cos = np.round(dots[keep] / (norms[keep] * qnorm), 6)
        kid = ids[keep]
        sel = np.lexsort((kid, -cos))[:k]
        return pa.table({
            "doc_id": pa.array(kid[sel].astype(np.int64), pa.int64()),
            "cos": pa.array(cos[sel], pa.float64())})

    parts = src.map_batches(partial, batch_format="pyarrow").take_all()
    if not parts:
        return rd.from_arrow(empty)
    allid = np.array([r["doc_id"] for r in parts], np.int64)
    allcos = np.array([r["cos"] for r in parts], np.float64)
    sel = np.lexsort((allid, -allcos))[:k]
    return rd.from_arrow(pa.table({
        "doc_id": pa.array(allid[sel], pa.int64()),
        "cos": pa.array(allcos[sel], pa.float64())}))


# ---------------- prefix autocomplete ----------------


def prefix_terms(docs, prefix: str, k: int = 10):
    """Autocomplete: the k highest-df vocabulary terms with a given
    prefix -> (term, df), ties on term ascending. The partial df
    relation filters to the prefix BEFORE the merge groupby, so only
    prefix-matching (term, partial-df) rows ever shuffle — the merge
    sees the prefix slice of the vocabulary, not the corpus."""

    def pfilter(b: pa.Table) -> pa.Table:
        return b.filter(pc.starts_with(b.column("term"), prefix))

    def finish(g: pa.Table) -> pa.Table:
        m = _merge_df(g.drop(["_g"]))
        t = m.column("term").to_numpy(zero_copy_only=False)
        d = m.column("df").to_numpy(zero_copy_only=False)
        sel = np.lexsort((t, -d))[:k]
        return pa.table({"term": pa.array(t[sel], pa.string()),
                         "df": pa.array(d[sel].astype(np.int64),
                                        pa.int64())})

    return docs.select_columns(["doc_id", "text"]) \
        .map_batches(_df_partial, batch_format="pyarrow") \
        .map_batches(pfilter, batch_format="pyarrow") \
        .map_batches(
            lambda b: b.append_column("_g", pa.array([0] * b.num_rows,
                                                     pa.int8())),
            batch_format="pyarrow") \
        .groupby("_g").map_groups(finish, batch_format="pyarrow")


# ---------------- term co-occurrence association pairs ----------------


def _multi_arange(starts: np.ndarray, lens: np.ndarray) -> np.ndarray:
    """Concatenated arange(starts[i], starts[i]+lens[i]) — one cumsum."""
    keep = lens > 0
    starts, lens = starts[keep], lens[keep]
    if not starts.size:
        return np.empty(0, np.int64)
    cl = np.cumsum(lens)
    out = np.ones(cl[-1], np.int64)
    out[0] = starts[0]
    out[cl[:-1]] = starts[1:] - (starts[:-1] + lens[:-1] - 1)
    return np.cumsum(out)


def association_pairs(docs, min_count: int = 5,
                      vocab_gate: int = 2_000_000):
    """Frequent co-occurring term pairs over per-doc DISTINCT token sets:
    (a, b, n_ab, lift) for pairs appearing together in >= ``min_count``
    docs, lift = n_ab * N / (n_a * n_b) — market-basket association
    mining with Apriori pruning.

    Stage 1 reuses the df combiner: only terms with df >= min_count can
    appear in a qualifying pair (Apriori monotonicity), so the frequent
    vocabulary broadcasts and per-doc pair expansion touches only
    frequent terms. Pair generation is one _multi_arange per batch (no
    per-doc Python); per-batch pair-code counts combine before the final
    tiny merge. The integer threshold makes the filter exact — lift is
    a ratio of integers, FP only at the final rounding.
    """
    import ray

    src = docs.select_columns(["doc_id", "text"])

    rows = src.map_batches(_df_partial, batch_format="pyarrow") \
        .map_batches(
            lambda b: b.append_column("_g", pa.array([0] * b.num_rows,
                                                     pa.int8())),
            batch_format="pyarrow") \
        .groupby("_g").map_groups(
            lambda g: _merge_df(g.drop(["_g"])),
            batch_format="pyarrow").take_all()
    n_docs = int(rows[0]["nd"]) if rows else 0
    freq = sorted((r["term"], r["df"]) for r in rows
                  if r["df"] >= min_count)
    if len(freq) > vocab_gate:
        raise ValueError(f"frequent vocab {len(freq)} exceeds gate")
    import ray.data as rd
    empty_out = pa.table({"a": pa.array([], pa.string()),
                          "b": pa.array([], pa.string()),
                          "n_ab": pa.array([], pa.int64()),
                          "lift": pa.array([], pa.float64())})
    if not freq:
        return rd.from_arrow(empty_out)
    fvocab = np.asarray([t for t, _ in freq], object)
    fdf = np.asarray([d for _, d in freq], np.int64)
    ref = ray.put((fvocab, fdf))
    nv = fvocab.size

    def pair_partial(b: pa.Table) -> pa.Table:
        v, _ = ray.get(ref)
        texts = b.column("text").to_pylist()
        per_doc = []
        for x in texts:
            s = sorted({t for t in TOKEN_RE.findall((x or "").lower())
                        if len(t) > 1})
            arr = np.asarray(s, object)
            pos = np.clip(np.searchsorted(v, arr), 0, v.size - 1) \
                if arr.size else np.empty(0, np.int64)
            per_doc.append(pos[v[pos] == arr] if arr.size else pos)
        lens = np.array([p.size for p in per_doc], np.int64)
        if not (lens > 1).any():
            return pa.table({"code": pa.array([], pa.int64()),
                             "c": pa.array([], pa.int64())})
        flat = np.concatenate(per_doc)
        offs = np.concatenate(([0], np.cumsum(lens)))[:-1]
        # all within-doc ordered pairs, one multi_arange for the right
        # side: position p in doc segment [s,e) pairs with (e-1-p) others
        seg_end = np.repeat(offs + lens, lens)
        p_idx = _multi_arange(offs, lens)
        counts = seg_end - p_idx - 1
        left = np.repeat(flat[p_idx], counts)
        right = flat[_multi_arange(p_idx + 1, counts)]
        code = left * nv + right
        uniq, cnt = np.unique(code, return_counts=True)
        return pa.table({"code": pa.array(uniq, pa.int64()),
                         "c": pa.array(cnt.astype(np.int64), pa.int64())})

    def finish(g: pa.Table) -> pa.Table:
        v, d = ray.get(ref)
        code = g.column("code").to_numpy(zero_copy_only=False)
        c = g.column("c").to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(code, return_inverse=True)
        sums = np.bincount(inv, weights=c).astype(np.int64)
        keep = sums >= min_count
        uniq, sums = uniq[keep], sums[keep]
        ai = uniq // nv
        bi = uniq % nv
        lift = np.round(sums * float(n_docs) /
                        (d[ai].astype(np.float64) * d[bi]), 6)
        return pa.table({"a": pa.array(v[ai], pa.string()),
                         "b": pa.array(v[bi], pa.string()),
                         "n_ab": pa.array(sums, pa.int64()),
                         "lift": pa.array(lift, pa.float64())})

    out = src.map_batches(pair_partial, batch_format="pyarrow") \
        .map_batches(
            lambda b: b.append_column("_g", pa.array([0] * b.num_rows,
                                                     pa.int8())),
            batch_format="pyarrow") \
        .groupby("_g").map_groups(lambda g: finish(g.drop(["_g"])),
                                  batch_format="pyarrow")
    return out


# ---------------- repetition / diversity signals ----------------


def repetition_stats(docs):
    """Gopher-style intra-document repetition signals (Rae et al. 2021,
    §A1.1 quality heuristics), fully vectorized:

    -> (doc_id, n_tokens, distinct_ratio, dup_trigram_frac, top_token_frac)
    - distinct_ratio: type-token ratio (distinct / total tokens)
    - dup_trigram_frac: 1 - distinct trigrams / trigrams (0 if < 3 tokens)
    - top_token_frac: frequency share of the most common token

    One pass, no shuffle: per-batch the token stream hashes once
    (functions/wordhash, 64-bit identity — collision odds ~n^2/2^64), then
    ONE lexsort per signal gives per-(doc, token) run lengths; per-doc
    reductions are bincount / maximum.at. Tokenization is the
    SQL-replicable variant so the DuckDB oracle verifies exact equality.
    """
    from ..functions.wordhash import batch_shingle_hashes, flat_word_hashes

    def stats(b: pa.Table) -> pa.Table:
        empty = pa.table({
            "doc_id": pa.array([], pa.int64()),
            "n_tokens": pa.array([], pa.int64()),
            "distinct_ratio": pa.array([], pa.float64()),
            "dup_trigram_frac": pa.array([], pa.float64()),
            "top_token_frac": pa.array([], pa.float64())})
        if b.num_rows == 0:
            return empty
        ids = b.column("doc_id").to_numpy(zero_copy_only=False)
        toks = [[t for t in TOKEN_RE.findall((x or "").lower())
                 if len(t) > 1] for x in b.column("text").to_pylist()]
        nd = ids.size
        counts = np.array([len(t) for t in toks], np.int64)
        wh = flat_word_hashes([t for ts in toks for t in ts])
        did = np.repeat(np.arange(nd), counts)
        # distinct tokens + max run per (doc, token)
        distinct = np.zeros(nd, np.int64)
        topc = np.zeros(nd, np.int64)
        if wh.size:
            order = np.lexsort((wh, did))
            ds, hs = did[order], wh[order]
            new = np.empty(ds.size, bool)
            new[0] = True
            new[1:] = (ds[1:] != ds[:-1]) | (hs[1:] != hs[:-1])
            run_id = np.cumsum(new) - 1
            run_len = np.bincount(run_id)
            run_doc = ds[new]
            distinct = np.bincount(run_doc, minlength=nd).astype(np.int64)
            np.maximum.at(topc, run_doc, run_len)
        # distinct trigrams per doc (mask the whole-doc fallback shingles
        # batch_shingle_hashes emits for 0 < n < 3 tokens)
        tri_total = np.maximum(counts - 2, 0)
        tri_distinct = np.zeros(nd, np.int64)
        th, toffs = batch_shingle_hashes([" ".join(t) for t in toks], 3)
        if th.size:
            t_did = np.repeat(np.arange(nd), np.diff(toffs))
            keep = counts[t_did] >= 3
            th, t_did = th[keep], t_did[keep]
            if th.size:
                order = np.lexsort((th, t_did))
                dsr, hsr = t_did[order], th[order]
                new = np.empty(dsr.size, bool)
                new[0] = True
                new[1:] = (dsr[1:] != dsr[:-1]) | (hsr[1:] != hsr[:-1])
                tri_distinct = np.bincount(dsr[new], minlength=nd).astype(
                    np.int64)
        safe_n = np.maximum(counts, 1).astype(np.float64)
        safe_tri = np.maximum(tri_total, 1).astype(np.float64)
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "n_tokens": pa.array(counts, pa.int64()),
            "distinct_ratio": pa.array(
                np.round(np.where(counts > 0, distinct / safe_n, 0.0), 6),
                pa.float64()),
            "dup_trigram_frac": pa.array(
                np.round(np.where(tri_total > 0,
                                  1.0 - tri_distinct / safe_tri, 0.0), 6),
                pa.float64()),
            "top_token_frac": pa.array(
                np.round(np.where(counts > 0, topc / safe_n, 0.0), 6),
                pa.float64()),
        })

    return docs.select_columns(["doc_id", "text"]) \
        .map_batches(stats, batch_format="pyarrow")


# ---------------- corpus n-gram (bigram) counts ----------------


def bigram_counts(docs, min_count: int = 5):
    """Corpus-wide adjacent-bigram counts -> (a, b, n) for bigrams
    occurring >= ``min_count`` times — the two-column face of
    :func:`ngram_counts` (ONE shared hash-combine kernel + groupby-sum
    plan, no duplicate implementation): each gram splits on its single
    space, valid because tokens contain no whitespace by construction.
    """
    grams = ngram_counts(docs, n=2, min_count=min_count)

    def split(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"a": pa.array([], pa.string()),
                             "b": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        parts = pc.split_pattern(b.column("gram"), " ")
        return pa.table({"a": pc.list_element(parts, 0),
                         "b": pc.list_element(parts, 1),
                         "n": b.column("n").cast(pa.int64())})

    return grams.map_batches(split, batch_format="pyarrow")


def ngram_counts(docs, n: int = 3, min_count: int = 5):
    """Corpus-wide n-token-gram counts -> (gram, n) for grams occurring
    >= ``min_count`` times; generalizes :func:`bigram_counts` to any n
    via the shared vectorized shingle-hash kernel
    (``functions/wordhash.batch_shingle_hashes`` — the MinHash kernel),
    so the per-batch cost is one token pass + k shifted multiply-adds.
    Same shape at scale: only (distinct-gram, partial-count) rows enter
    the native groupby Sum; gram strings materialize once per DISTINCT
    gram per batch, never per occurrence.
    """
    from ray.data.aggregate import Sum

    from ..functions.wordhash import batch_shingle_hashes

    def partial(b: pa.Table) -> pa.Table:
        empty = pa.table({"gram": pa.array([], pa.string()),
                          "c": pa.array([], pa.int64())})
        if b.num_rows == 0:
            return empty
        toks = [[t for t in TOKEN_RE.findall((x or "").lower())
                 if len(t) > 1] for x in b.column("text").to_pylist()]
        counts = np.array([len(t) for t in toks], np.int64)
        th, offs = batch_shingle_hashes([" ".join(t) for t in toks], n)
        if not th.size:
            return empty
        n_sh = np.diff(offs)
        t_did = np.repeat(np.arange(counts.size), n_sh)
        # drop the whole-doc fallback shingles docs with 0 < w < n emit
        keep = counts[t_did] >= n
        if not keep.any():
            return empty
        within = (np.arange(t_did.size)
                  - np.repeat(offs[:-1], n_sh))[keep]
        word_starts = np.concatenate(([0], np.cumsum(counts)))
        starts_flat = word_starts[t_did[keep]] + within
        th = th[keep]
        uniq, idx, cnt = np.unique(th, return_index=True,
                                   return_counts=True)
        flat = [w for ts in toks for w in ts]
        grams = [" ".join(flat[s:s + n])
                 for s in starts_flat[idx].tolist()]
        return pa.table({"gram": pa.array(grams, pa.string()),
                         "c": pa.array(cnt.astype(np.int64), pa.int64())})

    summed = docs.select_columns(["text"]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby("gram").aggregate(Sum("c", alias_name="n"))

    def finish(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"gram": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        t = b.filter(pc.greater_equal(b.column("n"), min_count))
        return pa.table({"gram": t.column("gram"),
                         "n": t.column("n").cast(pa.int64())})

    return summed.map_batches(finish, batch_format="pyarrow")


# ---------------- text normalization ----------------


def normalize_text(docs, drop_stopwords: bool = True):
    """Training-corpus text normalization -> (doc_id, norm_text,
    n_kept): lowercase, keep [a-z0-9]+ runs of length > 1, optionally
    drop stopwords, re-join with single spaces. The canonical form fed
    to tokenizer-training / hashing stages; embarrassingly parallel
    (one regex pass per row, no shuffle), SQL-replicable exactly
    (regexp_extract_all + list_filter + array_to_string).
    """
    stop = frozenset(STOP_WORDS) if drop_stopwords else frozenset()

    def norm(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "norm_text": pa.array([], pa.string()),
                             "n_kept": pa.array([], pa.int64())})
        texts = b.column("text").to_pylist()
        toks = [[t for t in TOKEN_RE.findall((x or "").lower())
                 if len(t) > 1 and t not in stop] for x in texts]
        return pa.table({
            "doc_id": b.column("doc_id").cast(pa.int64()),
            "norm_text": pa.array([" ".join(t) for t in toks],
                                  pa.string()),
            "n_kept": pa.array([len(t) for t in toks], pa.int64())})

    return docs.select_columns(["doc_id", "text"]) \
        .map_batches(norm, batch_format="pyarrow")


# ---------------- source-balanced resampling ----------------


def balance_sources(docs, seed: int = 7, id_col: str = "doc_id",
                    group_col: str = "source"):
    """Deterministic inverse-frequency downsampling so every ``source``
    contributes ~equally (the multilingual/temperature-resampling
    primitive, alpha -> 0 limit): keep a row iff

        weyl_hash(id, seed) < (2^32 * min_group_count) // group_count

    Pass 1 is a tiny native groupby count (one row per source) whose
    result broadcasts as a dict — never O(corpus) driver state. Pass 2
    is a vectorized hash-threshold filter, so the sample is stable
    under corpus growth per (id, seed) and EXACT in integer arithmetic:
    the threshold is computed with int64 // (no float rounding), making
    the DuckDB oracle bit-identical. -> (doc_id, source).
    """
    from ..stages.splits import weyl_hash

    counts = {r[group_col]: r["count()"]
              for r in docs.groupby(group_col).count().take_all()}
    if not counts:
        return docs.select_columns([id_col, group_col])
    mn = min(counts.values())
    thr = {g: (mn << 32) // c for g, c in counts.items()}

    def keep(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             group_col: pa.array([], pa.string())})
        ids = b.column(id_col).to_numpy(zero_copy_only=False)
        grp = b.column(group_col).to_pylist()
        h = weyl_hash(ids, seed)
        lim = np.fromiter((thr[g] for g in grp), np.int64, len(grp))
        mask = h < lim
        return pa.table({
            id_col: pa.array(ids[mask].astype(np.int64), pa.int64()),
            group_col: pa.array(np.asarray(grp, object)[mask],
                                pa.string())})

    return docs.select_columns([id_col, group_col]) \
        .map_batches(keep, batch_format="pyarrow")
