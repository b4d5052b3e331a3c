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


def _embed_text_matrix(texts, S: np.ndarray):
    """texts -> (kept_row_indices, rounded L2-normalized embedding
    matrix) — THE kernel both embed_docs batches and driver-side eval
    sets run, so the two can never drift."""
    toks = [[t for t in TOKEN_RE.findall((x or "").lower())
             if len(t) > 1] for x in texts]
    rows = [i for i, t in enumerate(toks) if t]
    if not rows:
        return rows, np.zeros((0, S.shape[1]), np.float64)
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
    return rows, round_half_away(E) + 0.0   # -0.0 -> +0.0 (hash parity)


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
        rows, E = _embed_text_matrix(texts, S)
        if not rows:
            return empty
        n, d = E.shape
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


def semantic_decontaminate(docs, eval_texts, threshold: float = 0.9,
                           n_features: int = 64, dim: int = 16,
                           seed: int = 7):
    """Semantic decontamination -> (doc_id, max_sim, contaminated):
    per document, the maximum embedding cosine against a benchmark/eval
    text set, and a flag at ``threshold`` — the similarity-space
    complement of the exact 8-gram :func:`~..decontam.decontaminate`
    (paraphrased eval leakage carries no shared 8-gram but survives in
    embedding space; cf. the contamination audits run for every modern
    LM release).

    The eval set is embedded DRIVER-SIDE with the identical kernel the
    per-batch path runs (``_embed_text_matrix``) and broadcast once
    (eval sets are thousands of rows — closure freight); each batch of
    generated doc embeddings is one (batch x dim) @ (dim x m) matmul
    plus a row max. No shuffle at all; both embedding generation and
    the cosine are DuckDB-replicable, so the whole chain hash-checks.
    The flag compares the ROUNDED similarity (both oracle sides), so a
    last-ulp dot-product divergence cannot flip it.
    """
    import ray

    S = sign_matrix(n_features, dim, seed)
    rows, Ev = _embed_text_matrix(list(eval_texts), S)
    if not rows:
        raise ValueError("eval_texts produced no embeddable text")
    ev_ref = ray.put(Ev.T.copy())          # (dim x m)

    long = embed_docs(docs, n_features=n_features, dim=dim, seed=seed)

    def score(b: pa.Table) -> pa.Table:
        empty = pa.table({"doc_id": pa.array([], pa.int64()),
                          "max_sim": pa.array([], pa.float64()),
                          "contaminated": pa.array([], pa.int64())})
        if b.num_rows == 0:
            return empty
        d = b.column("doc_id").to_numpy(zero_copy_only=False)
        j = b.column("j").to_numpy(zero_copy_only=False)
        e = b.column("e").to_numpy(zero_copy_only=False)
        # the reshape below requires dim-aligned batches with every doc
        # whole — guaranteed today by embed_docs emitting exactly `dim`
        # contiguous rows per doc and batch_size=dim*512, but an
        # upstream filter or Ray batching change would silently garble
        # embeddings, so fail loudly instead
        if b.num_rows % dim != 0:
            raise ValueError(
                f"semantic_decontaminate: batch of {b.num_rows} rows is "
                f"not dim={dim} aligned — a doc was split across batches")
        _, per_doc = np.unique(d, return_counts=True)
        if not (per_doc == dim).all():
            raise ValueError(
                "semantic_decontaminate: some doc_id does not appear "
                f"exactly dim={dim} times in the batch "
                f"(counts {np.unique(per_doc).tolist()})")
        o = np.lexsort((j, d))
        n = b.num_rows // dim
        E = e[o].reshape(n, dim)
        sims = E @ ray.get(ev_ref)          # (n x m)
        ms = round_half_away(sims.max(axis=1))
        return pa.table({
            "doc_id": pa.array(d[o][::dim].astype(np.int64), pa.int64()),
            "max_sim": pa.array(ms, pa.float64()),
            "contaminated": pa.array((ms >= threshold).astype(np.int64),
                                     pa.int64())})

    return long.map_batches(score, batch_format="pyarrow",
                            batch_size=dim * 512) \
        .sort("doc_id")


def embed_cte(n_features: int = 64, dim: int = 16, seed: int = 7,
              src: str = "documents", prefix: str = "") -> str:
    """The DuckDB CTE chain reproducing :func:`embed_docs` exactly,
    ending in ``{prefix}emb(doc_id, j, e)`` — callers compose it into
    full oracle statements. ``src``/``prefix`` let one statement embed
    a second relation (e.g. an eval-text VALUES list) with the same
    math under non-colliding CTE names."""
    from .classifier import feature_bucket_sql
    bucket = feature_bucket_sql("term", n_features)
    p = prefix
    sgn = sign_sql(f"{p}x.f", f"{p}dims.j", dim, seed)
    return f"""{p}toks AS (SELECT doc_id, unnest(list_filter(regexp_extract_all(lower(text),
              '[a-z0-9]+'), x -> length(x) > 1)) AS term FROM {src}),
{p}dl AS (SELECT doc_id, count(*) AS n FROM {p}toks GROUP BY doc_id),
{p}x AS (SELECT doc_id, f, cnt * 1.0 / {p}dl.n AS v
      FROM (SELECT doc_id, {bucket} AS f, count(*) AS cnt
            FROM {p}toks GROUP BY doc_id, f) JOIN {p}dl USING (doc_id)),
{p}dims AS (SELECT unnest(range(0, {dim})) AS j),
{p}raw AS (SELECT {p}x.doc_id, {p}dims.j, sum({p}x.v * {sgn}) AS r
        FROM {p}x CROSS JOIN {p}dims GROUP BY {p}x.doc_id, {p}dims.j),
{p}nrm AS (SELECT doc_id, sqrt(sum(r * r)) AS nm FROM {p}raw GROUP BY doc_id),
{p}emb AS (SELECT {p}raw.doc_id, {p}raw.j,
               CAST(round(CASE WHEN {p}nrm.nm > 0 THEN {p}raw.r / {p}nrm.nm
                               ELSE {p}raw.r END, 6) + 0.0 AS DOUBLE) AS e
        FROM {p}raw JOIN {p}nrm USING (doc_id))"""
