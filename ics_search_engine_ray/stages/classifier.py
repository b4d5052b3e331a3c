"""Distributed trainable document classifier (logistic regression by
full-batch gradient descent) — the fasttext-style quality/language filter
slot of an LLM data pipeline (CCNet trains a linear classifier over
hashed bag-of-words; Joulin et al. 2016, arXiv:1607.01759), built as Ray
Data passes:

- ONE featurize pass materializes (doc_id, y, x) with x a fixed-size
  hashed bag-of-terms vector, L1-normalized, plus a bias slot. The
  feature hash is deliberately SQL-expressible
  ((ascii(c1)*31 + ascii(c2)) % B over the term's first two chars) so
  training is DuckDB-checkable end to end.
- each GD iteration is one map_batches pass: the weight vector (O(B),
  tiny) broadcasts via ray.put, every batch emits ONE partial-gradient
  row (X^T (sigmoid(Xw) - y), n), the driver sums O(batches) rows and
  updates w. Full-batch gradients are sums, so the result is
  batch-layout-invariant — the property that makes the unrolled-CTE SQL
  oracle meaningful.
- prediction is a pure map pass with the final w in the closure.

At 100 TB the per-iteration exchange is O(batches x B) floats — the same
combiner shape as kmeans_fit; the corpus never reaches the driver.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np
import pyarrow as pa

from ..functions.tokenizer import TOKEN_RE
from .common import round_half_away


def _feat_type(n_features: int):
    return pa.list_(pa.float64(), n_features + 1)      # + bias slot


def feature_bucket_sql(term_expr: str, n_features: int) -> str:
    """The oracle-side bucket expression — MUST match _bucket()."""
    return (f"(ascii(substr({term_expr}, 1, 1)) * 31 + "
            f"ascii(substr({term_expr}, 2, 1))) % {n_features}")


def _bucket(terms: np.ndarray, n_features: int) -> np.ndarray:
    """Vectorized (ord(c0)*31 + ord(c1)) % B; terms are [a-z0-9]{2,}."""
    c0 = np.fromiter((ord(t[0]) for t in terms), np.int64, terms.size)
    c1 = np.fromiter((ord(t[1]) for t in terms), np.int64, terms.size)
    return (c0 * 31 + c1) % n_features


def featurize(docs, label_fn, n_features: int = 64):
    """(doc_id, text, ...) -> (doc_id, y, x): L1-normalized hashed
    bag-of-terms + bias. ``label_fn(batch) -> float64 array`` reads the
    label column(s); docs with zero qualifying tokens drop (they have no
    feature mass — the SQL oracle's inner join does the same)."""
    ftype = _feat_type(n_features)

    def fn(b: pa.Table) -> pa.Table:
        empty = pa.table({"doc_id": pa.array([], pa.int64()),
                          "y": pa.array([], pa.float64()),
                          "x": pa.array([], ftype)})
        if b.num_rows == 0:
            return empty
        texts = b.column("text").to_pylist()
        ids = b.column("doc_id").to_numpy(zero_copy_only=False)
        ys = label_fn(b)
        toks = [[t for t in TOKEN_RE.findall((x or "").lower())
                 if len(t) > 1] for x in texts]
        lens = np.array([len(t) for t in toks], np.int64)
        keep = lens > 0
        if not keep.any():
            return empty
        rows = np.flatnonzero(keep)
        mat = np.zeros((rows.size, n_features + 1), np.float64)
        for ri, di in enumerate(rows.tolist()):
            t = np.asarray(toks[di], object)
            bk = _bucket(t, n_features)
            cnt = np.bincount(bk, minlength=n_features).astype(np.float64)
            mat[ri, :n_features] = cnt / t.size
            mat[ri, n_features] = 1.0                   # bias
        flat = pa.array(mat.reshape(-1), pa.float64())
        return pa.table({
            "doc_id": pa.array(ids[rows].astype(np.int64), pa.int64()),
            "y": pa.array(ys[rows].astype(np.float64), pa.float64()),
            "x": pa.FixedSizeListArray.from_arrays(flat, n_features + 1)})

    return docs.map_batches(fn, batch_format="pyarrow")


def _xmat(b: pa.Table, d: int) -> np.ndarray:
    col = b.column("x")
    if col.num_chunks == 1:
        arr = col.chunk(0)
    else:
        arr = col.combine_chunks()
    # .flatten(), NOT .values: .values ignores a sliced array's offset and
    # length, silently misaligning X with this batch's y
    return arr.flatten().to_numpy(zero_copy_only=False).reshape(-1, d)


def train_logreg(feats, n_features: int = 64, iters: int = 5,
                 lr: float = 1.0) -> np.ndarray:
    """Full-batch GD on the materialized feature relation -> w
    (n_features + 1 incl. bias). One distributed pass per iteration;
    each batch ships a single (grad-vector, count) partial."""
    import ray

    d = n_features + 1
    feats = feats.materialize()

    # N once (batch counts ride every gradient partial too, but the
    # normalizer must be global and fixed across iterations)
    n_total = feats.count()
    if n_total == 0:
        return np.zeros(d)
    w = np.zeros(d)
    gtype = _feat_type(n_features)                     # d slots

    for _ in range(iters):
        wref = ray.put(w)

        def gpart(b: pa.Table) -> pa.Table:
            if b.num_rows == 0:
                return pa.table({"g": pa.array([], gtype),
                                 "n": pa.array([], pa.int64())})
            ww = ray.get(wref)
            X = _xmat(b, d)
            y = b.column("y").to_numpy(zero_copy_only=False)
            z = X @ ww
            p = 1.0 / (1.0 + np.exp(-z))
            g = X.T @ (p - y)
            return pa.table({
                "g": pa.FixedSizeListArray.from_arrays(
                    pa.array(g, pa.float64()), d),
                "n": pa.array([b.num_rows], pa.int64())})

        parts = feats.map_batches(gpart, batch_format="pyarrow").take_all()
        g = np.zeros(d)
        for r in parts:
            g += np.asarray(r["g"], np.float64)
        w = w - lr * (g / n_total)
    return w


def predict_logreg(feats, w: np.ndarray):
    """-> (doc_id, p, pred): sigmoid scores under a trained w (pure map;
    w rides the closure — O(B), the one model-size broadcast)."""
    d = w.size
    ww = w.copy()

    def fn(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "p": pa.array([], pa.float64()),
                             "pred": pa.array([], pa.int64())})
        X = _xmat(b, d)
        p = 1.0 / (1.0 + np.exp(-(X @ ww)))
        pr = round_half_away(p)         # DuckDB round() parity
        return pa.table({
            "doc_id": b.column("doc_id").cast(pa.int64()),
            "p": pa.array(pr, pa.float64()),
            "pred": pa.array((pr >= 0.5).astype(np.int64), pa.int64())})

    return feats.map_batches(fn, batch_format="pyarrow")


def logreg_sql(label_case: str, n_features: int = 64, iters: int = 5,
               lr: float = 1.0, tokens_cte: str = None,
               emit: str = "weights") -> str:
    """Unrolled-iteration DuckDB replica of the exact training math:
    w_{t+1} = w_t - lr/N * X^T (sigmoid(X w_t) - y). ``label_case`` is a
    SQL expression over ``documents`` (e.g. CASE WHEN lang = 'en' ...).
    ``emit``: 'weights' -> (f, w) after ``iters``; 'scores' ->
    per-doc (doc_id, p, pred)."""
    d = n_features + 1
    cte = tokens_cte or (
        "SELECT doc_id, unnest(list_filter(regexp_extract_all(lower(text),"
        " '[a-z0-9]+'), x -> length(x) > 1)) AS term FROM documents")
    bucket = feature_bucket_sql("term", n_features)
    parts = [
        f"toks AS ({cte})",
        f"dl AS (SELECT doc_id, count(*) AS n FROM toks GROUP BY doc_id)",
        # hashed bag-of-terms + bias rows (f = n_features is the bias slot)
        f"""x AS (
  SELECT doc_id, f, cnt * 1.0 / dl.n AS v
  FROM (SELECT doc_id, {bucket} AS f, count(*) AS cnt
        FROM toks GROUP BY doc_id, f) JOIN dl USING (doc_id)
  UNION ALL SELECT doc_id, {n_features} AS f, 1.0 AS v FROM dl)""",
        f"lbl AS (SELECT doc_id, CAST({label_case} AS DOUBLE) AS y "
        f"FROM documents JOIN dl USING (doc_id))",
        "nn AS (SELECT count(*) AS n FROM dl)",
        f"w0 AS (SELECT CAST(f AS BIGINT) AS f, 0.0 AS v "
        f"FROM range(0, {d}) t(f))",
    ]
    for t in range(iters):
        parts.append(f"""z{t} AS (
  SELECT x.doc_id, sum(x.v * w{t}.v) AS z
  FROM x JOIN w{t} USING (f) GROUP BY x.doc_id)""")
        parts.append(f"""g{t} AS (
  SELECT x.f, sum((1.0 / (1.0 + exp(-z{t}.z)) - lbl.y) * x.v) AS g
  FROM x JOIN z{t} USING (doc_id) JOIN lbl USING (doc_id) GROUP BY x.f)""")
        parts.append(f"""w{t + 1} AS (
  SELECT w{t}.f, w{t}.v - {lr} * COALESCE(g{t}.g, 0.0) / nn.n AS v
  FROM w{t} LEFT JOIN g{t} USING (f) CROSS JOIN nn)""")
    wfin = f"w{iters}"
    if emit == "weights":
        tail = (f"SELECT f, CAST(round(v, 6) AS DOUBLE) AS w FROM {wfin} "
                "ORDER BY f")
    else:
        tail = f"""SELECT zz.doc_id,
       CAST(round(1.0 / (1.0 + exp(-zz.z)), 6) AS DOUBLE) AS p,
       CAST(CASE WHEN round(1.0 / (1.0 + exp(-zz.z)), 6) >= 0.5
                 THEN 1 ELSE 0 END AS BIGINT) AS pred
FROM (SELECT x.doc_id, sum(x.v * {wfin}.v) AS z
      FROM x JOIN {wfin} USING (f) GROUP BY x.doc_id) zz"""
    return "WITH " + ",\n".join(parts) + "\n" + tail


def nb_lang_scores(docs, vocab_gate: int = 2_000_000):
    """Multinomial Naive Bayes language identifier TRAINED on the
    corpus's own ``lang`` labels (add-one smoothing over SQL-form word
    features) -> (doc_id, lang_pred, score): the classic supervised
    langid.py / fasttext-lid shape (Lui & Baldwin 2012) as two Ray Data
    passes, replacing heuristics with a real trained model.

    - **train**: per-batch (lang, term) occurrence counts -> ONE native
      pair groupby (O(langs x vocab) rows, the only corpus-sized
      shuffle); per-lang token totals, doc-count priors and the distinct
      vocabulary size V fold out of that relation.
    - **model**: per-(lang, term) log-likelihoods and per-lang priors in
      integer MICRO-NATS (half-away round of 1e6*ln, the dsir_logweights
      trick) so per-doc sums are order-independent int64 adds that
      hash-match the SQL oracle exactly. Unseen terms take the smoothed
      floor ln(1/(tot_l+V)); languages labeled in documents but absent
      from the pair relation train with tot=0 (pure smoothing).
    - **predict**: the model (langs x vocab ints) broadcasts once via
      ``ray.put`` into an actor-pool stage; each batch is one gather +
      ``np.add.reduceat`` over token rows, argmax per doc with ties to
      the lexicographically smallest language. Token-less docs score
      prior-only.

    The model relation is size-gated at ``vocab_gate`` rows (raises) —
    the documented scale path above it re-expresses scoring as a
    (doc, term, k) x model hash join plus a per-doc groupby sum instead
    of a broadcast (see SCALE.md)."""
    import ray
    from ray.data.aggregate import Count, Sum

    from .common import half_away_scaled_int

    def pair_partial(b: pa.Table) -> pa.Table:
        empty = pa.table({"lang": pa.array([], pa.string()),
                          "term": pa.array([], pa.string()),
                          "ct": pa.array([], pa.int64())})
        if b.num_rows == 0:
            return empty
        agg: dict = {}
        for lg, x in zip(b.column("lang").to_pylist(),
                         b.column("text").to_pylist()):
            for t in TOKEN_RE.findall((x or "").lower()):
                if len(t) > 1:
                    agg[(lg, t)] = agg.get((lg, t), 0) + 1
        ks = sorted(agg)
        return pa.table({
            "lang": pa.array([a for a, _ in ks], pa.string()),
            "term": pa.array([t for _, t in ks], pa.string()),
            "ct": pa.array([agg[k] for k in ks], pa.int64())})

    pairs = docs.select_columns(["lang", "text"]) \
        .map_batches(pair_partial, batch_format="pyarrow") \
        .groupby(["lang", "term"]).aggregate(Sum("ct", alias_name="ct"))

    # priors: docs per lang (tiny — O(languages) rows)
    nl_parts = [b for b in docs.groupby("lang")
                .aggregate(Count(alias_name="nd"))
                .iter_batches(batch_format="pyarrow") if b.num_rows]
    nd_of: dict = {}
    for b in nl_parts:
        for lg, nd in zip(b.column("lang").to_pylist(),
                          b.column("nd").to_pylist()):
            nd_of[lg] = int(nd)
    n_docs = sum(nd_of.values())
    langs = sorted(nd_of)
    if not langs:
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "lang_pred": pa.array([], pa.string()),
                         "score": pa.array([], pa.int64())})

    # collect the model relation under the gate
    rows = 0
    parts = []
    for b in pairs.iter_batches(batch_format="pyarrow"):
        if b.num_rows == 0:
            continue
        rows += b.num_rows
        if rows > vocab_gate:
            raise ValueError(
                f"nb_lang_scores model gate: > {vocab_gate} (lang, term) "
                f"rows; use the hash-join scoring path (SCALE.md)")
        parts.append(b if isinstance(b, pa.Table)
                     else pa.Table.from_batches([b]))
    if parts:
        m = pa.concat_tables(parts)
        p_lang = m.column("lang").to_pylist()
        p_term = m.column("term").to_pylist()
        p_ct = m.column("ct").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
    else:
        p_lang, p_term = [], []
        p_ct = np.zeros(0, np.int64)

    terms = sorted(set(p_term))
    tid = {t: i for i, t in enumerate(terms)}
    lid = {lg: i for i, lg in enumerate(langs)}
    v = len(terms)
    n_langs = len(langs)
    tot = np.zeros(n_langs, np.int64)
    cmat = np.zeros((v, n_langs), np.int64)
    for lg, t, c in zip(p_lang, p_term, p_ct):
        cmat[tid[t], lid[lg]] = c
        tot[lid[lg]] += c

    # LT rows 0..v-1: per-term log-liks; row v: unseen-term floor
    lt = np.zeros((v + 1, n_langs), np.int64)
    if v:
        lt[:v] = half_away_scaled_int(
            np.log((cmat + 1.0) / (tot + v)[None, :]), 1_000_000)
        lt[v] = half_away_scaled_int(np.log(1.0 / (tot + v)), 1_000_000)
    prior = half_away_scaled_int(
        np.log(np.array([nd_of[lg] for lg in langs], np.float64)
               / n_docs), 1_000_000)
    model_ref = ray.put((tid, lt, prior, langs, v))

    class Predict:
        def __init__(self):
            (self.tid, self.lt, self.prior, self.langs,
             self.v) = ray.get(model_ref)

        def __call__(self, b: pa.Table) -> pa.Table:
            empty = pa.table({"doc_id": pa.array([], pa.int64()),
                              "lang_pred": pa.array([], pa.string()),
                              "score": pa.array([], pa.int64())})
            if b.num_rows == 0:
                return empty
            ids = b.column("doc_id").to_numpy(zero_copy_only=False)
            n = b.num_rows
            scores = np.tile(self.prior, (n, 1))
            if self.v:
                flat, lens = [], np.zeros(n, np.int64)
                for i, x in enumerate(b.column("text").to_pylist()):
                    toks = [t for t in TOKEN_RE.findall((x or "").lower())
                            if len(t) > 1]
                    lens[i] = len(toks)
                    flat.extend(self.tid.get(t, self.v) for t in toks)
                if flat:
                    contrib = self.lt[np.asarray(flat, np.int64)]
                    nz = lens > 0
                    starts = np.concatenate(
                        ([0], np.cumsum(lens[nz])[:-1])).astype(np.int64)
                    scores[nz] += np.add.reduceat(contrib, starts, axis=0)
            best = scores.argmax(axis=1)   # first max = lex-smallest lang
            return pa.table({
                "doc_id": pa.array(ids, pa.int64()),
                "lang_pred": pa.array([self.langs[i] for i in best],
                                      pa.string()),
                "score": pa.array(scores[np.arange(n), best], pa.int64())})

    return docs.select_columns(["doc_id", "text"]) \
        .map_batches(Predict, batch_format="pyarrow",
                     concurrency=(1, 8)).sort("doc_id")


def nb_lang_sql(tokens_cte: str) -> str:
    """The DuckDB mirror of :func:`nb_lang_scores` (shared so tests and
    the driver oracle cannot drift apart)."""
    return f"""
WITH toks AS ({tokens_cte}),
clt AS (SELECT d.lang, t.term, count(*) AS c
        FROM toks t JOIN documents d USING (doc_id)
        GROUP BY d.lang, t.term),
cl AS (SELECT lang, CAST(sum(c) AS BIGINT) AS tot FROM clt GROUP BY lang),
v AS (SELECT count(DISTINCT term) AS v FROM clt),
nl AS (SELECT lang, count(*) AS nd FROM documents GROUP BY lang),
n AS (SELECT count(*) AS n FROM documents),
prior AS (SELECT lang,
          CAST(round(ln(CAST(nd AS DOUBLE) / n) * 1000000, 0) AS BIGINT)
            AS p FROM nl, n),
ll AS (SELECT c.lang, c.term,
       CAST(round(ln((c.c + 1.0) / (cl.tot + v.v)) * 1000000, 0)
            AS BIGINT) AS l
       FROM clt c JOIN cl ON c.lang = cl.lang, v),
l0 AS (SELECT nl.lang,
       CAST(round(ln(1.0 / (coalesce(cl.tot, 0) + v.v)) * 1000000, 0)
            AS BIGINT) AS l
       FROM nl LEFT JOIN cl USING (lang), v),
tokc AS (SELECT doc_id, term, count(*) AS k FROM toks
         GROUP BY doc_id, term),
contrib AS (SELECT tc.doc_id, l0.lang,
            CAST(sum(tc.k * coalesce(ll.l, l0.l)) AS BIGINT) AS s
            FROM tokc tc CROSS JOIN l0
            LEFT JOIN ll ON ll.lang = l0.lang AND ll.term = tc.term
            GROUP BY tc.doc_id, l0.lang),
sc AS (SELECT d.doc_id, pr.lang, pr.p + coalesce(ct.s, 0) AS score
       FROM documents d CROSS JOIN prior pr
       LEFT JOIN contrib ct
         ON ct.doc_id = d.doc_id AND ct.lang = pr.lang)
SELECT doc_id, lang AS lang_pred, score FROM (
  SELECT doc_id, lang, score,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY score DESC, lang ASC) AS rn
  FROM sc) WHERE rn = 1 ORDER BY doc_id"""
