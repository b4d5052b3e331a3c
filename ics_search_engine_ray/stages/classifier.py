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
