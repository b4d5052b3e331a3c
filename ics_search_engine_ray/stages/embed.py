"""Deterministic text embeddings by hashed random projection — the
model-free stand-in for a neural embedder (the container has no model
runtime) that makes the text -> embedding -> ANN pipeline a first-class,
ORACLE-CHECKABLE path instead of requiring a pre-supplied vector table.

x = L1-normalized hashed bag-of-terms (the classifier's SQL-expressible
bucket hash), projected through a {-1, +1} sign matrix whose entries are
a pure integer function of (bucket, output dim) — the same Weyl-multiply
trick the split/balance operators use — then L2-normalized. Random
projection preserves cosine geometry in expectation (Johnson-
Lindenstrauss; Achlioptas 2003 sign-matrix variant), and every step is
replicable in DuckDB, so embedding generation AND downstream cosine
top-k both hash-check against SQL.

Embeddings emit in LONG form (doc_id, j, e) — the driver's value-hash
cannot digest list columns — and intra-pipeline consumers reshape to
matrices per batch.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.tokenizer import TOKEN_RE
from .classifier import _bucket
from .common import round_half_away

_WEYL = 2654435761
_MOD = 1 << 32


def sign_matrix(n_features: int, dim: int, seed: int = 7) -> np.ndarray:
    """(n_features x dim) +-1 matrix: +1 iff
    ((f*dim + j + seed) * 2654435761) % 2^32 < 2^31 — matches
    :func:`sign_sql` bit for bit."""
    idx = (np.arange(n_features)[:, None] * dim
           + np.arange(dim)[None, :] + seed).astype(np.int64)
    h = (idx * _WEYL) % _MOD
    return np.where(h < (_MOD >> 1), 1.0, -1.0)


def sign_sql(f_expr: str, j_expr: str, dim: int, seed: int = 7) -> str:
    return (f"CASE WHEN (({f_expr} * {dim} + {j_expr} + {seed}) * {_WEYL})"
            f" % {_MOD} < {_MOD >> 1} THEN 1.0 ELSE -1.0 END")


def embed_docs(docs, n_features: int = 64, dim: int = 16, seed: int = 7):
    """(doc_id, text) -> LONG-form embeddings (doc_id, j, e): hashed
    bag-of-terms -> sign projection -> L2 normalize -> round 6
    (half-away, DuckDB parity). Pure map, one matmul per batch; docs
    with zero qualifying tokens drop (no feature mass). Zero-norm
    projections (exact sign cancellation) emit unnormalized zeros, like
    the SQL CASE."""
    S = sign_matrix(n_features, dim, seed)

    def fn(b: pa.Table) -> pa.Table:
        empty = pa.table({"doc_id": pa.array([], pa.int64()),
                          "j": pa.array([], pa.int64()),
                          "e": pa.array([], pa.float64())})
        if b.num_rows == 0:
            return empty
        texts = b.column("text").to_pylist()
        ids = b.column("doc_id").to_numpy(zero_copy_only=False)
        toks = [[t for t in TOKEN_RE.findall((x or "").lower())
                 if len(t) > 1] for x in texts]
        rows = [i for i, t in enumerate(toks) if t]
        if not rows:
            return empty
        X = np.zeros((len(rows), S.shape[0]), np.float64)
        for ri, di in enumerate(rows):
            t = np.asarray(toks[di], object)
            cnt = np.bincount(_bucket(t, S.shape[0]),
                              minlength=S.shape[0]).astype(np.float64)
            X[ri] = cnt / t.size
        E = X @ S
        norms = np.sqrt((E * E).sum(axis=1))
        nz = norms > 0
        E[nz] = E[nz] / norms[nz, None]
        E = round_half_away(E) + 0.0        # -0.0 -> +0.0 (hash parity:
        n, d = E.shape                      # both sides canonicalize)
        return pa.table({
            "doc_id": pa.array(np.repeat(ids[rows].astype(np.int64), d),
                               pa.int64()),
            "j": pa.array(np.tile(np.arange(d, dtype=np.int64), n),
                          pa.int64()),
            "e": pa.array(E.reshape(-1), pa.float64())})

    return docs.select_columns(["doc_id", "text"]) \
        .map_batches(fn, batch_format="pyarrow")


def knn_text(docs, query_doc_id: int, k: int = 10, n_features: int = 64,
             dim: int = 16, seed: int = 7):
    """Text-native similarity search -> (doc_id, cos): cosine top-k of
    the generated (rounded) embeddings against ONE query doc's embedding
    — the end-to-end text -> vector -> ANN pipeline with no external
    vector table. The query vector (dim floats) broadcasts in the
    closure; each batch computes a local top-k partial and only
    batches x k rows reach the driver (knn_brute pattern). Cosines are
    computed over the ROUNDED embeddings (what embed_docs emits), so the
    SQL replica sums the identical values."""
    import ray.data as rd

    long = embed_docs(docs, n_features, dim, seed).materialize()
    qrows = long.map_batches(
        lambda b: b.filter(pa.compute.equal(b.column("doc_id"),
                                            query_doc_id)),
        batch_format="pyarrow").take_all()
    empty = pa.table({"doc_id": pa.array([], pa.int64()),
                      "cos": pa.array([], pa.float64())})
    if not qrows:
        return rd.from_arrow(empty)
    q = np.zeros(dim)
    for r in qrows:
        q[int(r["j"])] = float(r["e"])
    qn = float(np.sqrt((q * q).sum()))
    if qn == 0:
        return rd.from_arrow(empty)

    def topk_part(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return empty
        d = b.column("doc_id").to_numpy(zero_copy_only=False)
        j = b.column("j").to_numpy(zero_copy_only=False)
        e = b.column("e").to_numpy(zero_copy_only=False)
        o = np.lexsort((j, d))
        d, j, e = d[o], j[o], e[o]
        # long form arrives dim-dense per doc (one emit site)
        ids = d[::dim]
        E = e.reshape(-1, dim)
        norms = np.sqrt((E * E).sum(axis=1))
        keep = (norms > 0) & (ids != query_doc_id)
        if not keep.any():
            return empty
        cos = round_half_away((E[keep] @ q) / (norms[keep] * qn)) + 0.0
        kid = ids[keep]
        sel = np.lexsort((kid, -cos))[:k]
        return pa.table({"doc_id": pa.array(kid[sel].astype(np.int64),
                                            pa.int64()),
                         "cos": pa.array(cos[sel], pa.float64())})

    # batch_size a multiple of dim: embed blocks are dim-aligned, so every
    # slice point stays doc-aligned and topk_part always sees whole docs
    parts = long.map_batches(topk_part, batch_format="pyarrow",
                             batch_size=dim * 512).take_all()
    if not parts:
        return rd.from_arrow(empty)
    ids = np.array([r["doc_id"] for r in parts], np.int64)
    cos = np.array([r["cos"] for r in parts], np.float64)
    sel = np.lexsort((ids, -cos))[:k]
    return rd.from_arrow(pa.table({
        "doc_id": pa.array(ids[sel], pa.int64()),
        "cos": pa.array(cos[sel], pa.float64())}))


def embed_cte(n_features: int = 64, dim: int = 16, seed: int = 7) -> str:
    """The DuckDB CTE chain reproducing :func:`embed_docs` exactly,
    ending in ``emb(doc_id, j, e)`` — callers compose it into full
    oracle statements."""
    from .classifier import feature_bucket_sql
    bucket = feature_bucket_sql("term", n_features)
    sgn = sign_sql("x.f", "dims.j", dim, seed)
    return f"""toks AS (SELECT doc_id, unnest(list_filter(regexp_extract_all(lower(text),
              '[a-z0-9]+'), x -> length(x) > 1)) AS term FROM documents),
dl AS (SELECT doc_id, count(*) AS n FROM toks GROUP BY doc_id),
x AS (SELECT doc_id, f, cnt * 1.0 / dl.n AS v
      FROM (SELECT doc_id, {bucket} AS f, count(*) AS cnt
            FROM toks GROUP BY doc_id, f) JOIN dl USING (doc_id)),
dims AS (SELECT unnest(range(0, {dim})) AS j),
raw AS (SELECT x.doc_id, dims.j, sum(x.v * {sgn}) AS r
        FROM x CROSS JOIN dims GROUP BY x.doc_id, dims.j),
nrm AS (SELECT doc_id, sqrt(sum(r * r)) AS nm FROM raw GROUP BY doc_id),
emb AS (SELECT raw.doc_id, raw.j,
               CAST(round(CASE WHEN nrm.nm > 0 THEN raw.r / nrm.nm
                               ELSE raw.r END, 6) + 0.0 AS DOUBLE) AS e
        FROM raw JOIN nrm USING (doc_id))"""
