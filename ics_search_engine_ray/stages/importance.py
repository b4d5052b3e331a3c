"""Data-selection importance resampling (DSIR, Xie et al. 2023,
"Data Selection for Language Models via Importance Resampling"): score
every document by how much more likely its hashed-n-gram bag is under a
TARGET distribution than under the RAW corpus distribution, so a
training pipeline can resample toward the target domain without a
learned classifier.

Ray-Data-native shape (two streaming passes, one tiny shuffle):

- **pass A** — per-batch hashed-unigram bucket histograms (one
  ``np.bincount`` per batch for the raw corpus, one for the target
  subset) -> native ``groupby(bucket).Sum`` over the SPARSE partial rows
  (the only shuffle, O(batches x K) rows) -> the K-bucket count table.
- **bridge** — the per-bucket log-ratio table is K int64 micro-nat
  values (``round(ln(p_t/p_r) * 1e6)``, add-one smoothed); it ships once
  via ``ray.put``. Integer micro-nats make the per-doc sum
  order-independent and bit-identical to the SQL oracle — a float log
  sum would drift with summation order.
- **pass B** — per-batch, per-doc score = sum of bucket micro-nats over
  token occurrences (vectorized bincount-weighted dot); ONE float
  division at the end.

The hash is the first 8 hex digits of md5(term) mod K — deliberately
SQL-replicable (``('0x' || substr(md5(term), 1, 8))::BIGINT % K``), and
the tokenization is the repo's canonical SQL-token form (lowercase
``[a-z0-9]+`` runs, length > 1). Docs with no tokens emit nothing, like
the SQL groupby.

At 10^12 docs: K is fixed (default 4096 buckets — DSIR's paper uses
10k-dim hashed features), so driver state is O(K), never O(corpus or
vocab); both passes are shuffle-free maps; the bucket-count merge moves
O(batches x K) rows.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from ..functions.tokenizer import TOKEN_RE

_MD5_CACHE_MAX = 1 << 20


class _BucketCounter:
    """Per-actor hashed-bucket tokenizer: md5-bucket memo shared across
    batches (vocabulary repeats heavily — the memo turns per-occurrence
    hashing into per-distinct-term hashing)."""

    def __init__(self, k: int):
        self.k = k
        self.memo: dict = {}

    def bucket_of(self, term: str) -> int:
        b = self.memo.get(term)
        if b is None:
            b = int(hashlib.md5(term.encode("utf-8")).hexdigest()[:8],
                    16) % self.k
            if len(self.memo) < _MD5_CACHE_MAX:
                self.memo[term] = b
        return b

    def doc_buckets(self, text: str) -> np.ndarray:
        toks = [t for t in TOKEN_RE.findall((text or "").lower())
                if len(t) > 1]
        if not toks:
            return np.empty(0, np.int64)
        return np.fromiter((self.bucket_of(t) for t in toks),
                           np.int64, len(toks))

    def batch_buckets(self, texts):
        """(flat bucket ids, per-doc lengths) for a whole batch — ONE
        concatenated array so downstream kernels run one bincount /
        reduceat per BATCH, not per document (O(tokens + K), no
        per-doc K-sized allocations)."""
        per_doc = [self.doc_buckets(x) for x in texts]
        lens = np.fromiter((a.size for a in per_doc), np.int64,
                           len(per_doc))
        flat = (np.concatenate(per_doc) if lens.sum()
                else np.empty(0, np.int64))
        return flat, lens


def dsir_logweights(docs, target_source: str, k: int = 4096,
                    source_col: str = "source"):
    """documents(doc_id, text, source) -> (doc_id, dsir_logw): add-one
    smoothed hashed-unigram log importance weight of each document
    toward ``target_source``'s token distribution, in exact 1e-6 units
    (micro-nats) so the result hash-matches the SQL oracle.

    ``dsir_logw = sum_tokens round(1e6 * ln( (ct_t[b]+1)/(n_t+K)
                  * (n_r+K)/(ct_r[b]+1) )) / 1e6``
    """
    import pyarrow.compute as pc
    import ray
    from ray.data.aggregate import Sum

    from .common import half_away_scaled_int

    # consumed by both passes: re-read from the (parquet-backed) input
    # per pass rather than pinning an O(corpus) copy in the object store
    docs = docs.select_columns(list(("doc_id", "text", source_col)))

    class PassA:
        def __init__(self):
            self.bc = _BucketCounter(k)

        def __call__(self, b: pa.Table) -> pa.Table:
            empty = pa.table({"bkt": pa.array([], pa.int64()),
                              "ct_t": pa.array([], pa.int64()),
                              "ct_r": pa.array([], pa.int64())})
            if b.num_rows == 0:
                return empty
            texts = b.column("text").to_pylist()
            is_t = pc.equal(b.column(source_col), target_source) \
                .to_numpy(zero_copy_only=False)
            flat, lens = self.bc.batch_buckets(texts)
            if flat.size == 0:
                return empty
            raw = np.bincount(flat, minlength=k).astype(np.int64)
            t_mask = np.repeat(is_t, lens)
            tgt = np.bincount(flat[t_mask],
                              minlength=k).astype(np.int64)
            nz = np.flatnonzero(raw)
            if nz.size == 0:
                return empty
            return pa.table({"bkt": pa.array(nz, pa.int64()),
                             "ct_t": pa.array(tgt[nz], pa.int64()),
                             "ct_r": pa.array(raw[nz], pa.int64())})

    merged = docs.map_batches(PassA, batch_format="pyarrow",
                              concurrency=(1, 8)) \
        .groupby("bkt").aggregate(Sum("ct_t", alias_name="ct_t"),
                                  Sum("ct_r", alias_name="ct_r"))
    parts = [t for t in ray.get(merged.materialize().to_arrow_refs())
             if t.num_rows]
    ct_t = np.zeros(k, np.int64)
    ct_r = np.zeros(k, np.int64)
    n_t = 0
    n_r = 0
    if parts:
        m = pa.concat_tables(parts)
        bk = m.column("bkt").to_numpy(zero_copy_only=False)
        tt = m.column("ct_t").cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        rr = m.column("ct_r").cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        ct_t[bk] = tt
        ct_r[bk] = rr
        n_t = int(tt.sum())
        n_r = int(rr.sum())
    # identical evaluation order to the SQL expression:
    # ((ct_t+1)/(n_t+K)) * (n_r+K) / (ct_r+1)
    ratio = (ct_t + 1.0) / (n_t + k) * (n_r + k) / (ct_r + 1.0)
    l_int = half_away_scaled_int(np.log(ratio), 1_000_000)
    l_ref = ray.put(l_int)

    class PassB:
        def __init__(self):
            self.bc = _BucketCounter(k)
            self.li = ray.get(l_ref)

        def __call__(self, b: pa.Table) -> pa.Table:
            empty = pa.table({"doc_id": pa.array([], pa.int64()),
                              "dsir_logw": pa.array([], pa.float64())})
            if b.num_rows == 0:
                return empty
            ids = b.column("doc_id").to_numpy(zero_copy_only=False)
            flat, lens = self.bc.batch_buckets(
                b.column("text").to_pylist())
            keep = lens > 0          # token-less docs emit nothing (SQL)
            if not keep.any():
                return empty
            offs = np.concatenate(([0], np.cumsum(lens)))[:-1][keep]
            scores = np.add.reduceat(self.li[flat], offs) \
                if flat.size else np.empty(0, np.int64)
            return pa.table({
                "doc_id": pa.array(ids[keep].astype(np.int64),
                                   pa.int64()),
                "dsir_logw": pa.array(scores / 1_000_000.0,
                                      pa.float64())})

    return docs.map_batches(PassB, batch_format="pyarrow",
                            concurrency=(1, 8))


def dsir_sql(k: int, target_source: str, tokens_cte: str,
             source_col: str = "source") -> str:
    """The DuckDB mirror of :func:`dsir_logweights` (shared so tests and
    the driver oracle cannot drift apart)."""
    return f"""
WITH toks AS ({tokens_cte}),
b AS (SELECT doc_id,
             ('0x' || substr(md5(term), 1, 8))::BIGINT % {k} AS bkt
      FROM toks),
raw AS (SELECT bkt, count(*) AS ct FROM b GROUP BY bkt),
tgt AS (SELECT bkt, count(*) AS ct
        FROM b JOIN documents USING (doc_id)
        WHERE {source_col} = '{target_source}' GROUP BY bkt),
nt AS (SELECT count(*) AS n FROM b JOIN documents USING (doc_id)
       WHERE {source_col} = '{target_source}'),
nr AS (SELECT count(*) AS n FROM b),
l AS (SELECT raw.bkt,
             CAST(round(ln( (coalesce(tgt.ct, 0) + 1.0) / (nt.n + {k})
                           * (nr.n + {k}) / (raw.ct + 1.0) )
                        * 1000000.0, 0) AS BIGINT) AS li
      FROM raw LEFT JOIN tgt USING (bkt) CROSS JOIN nt CROSS JOIN nr)
SELECT b.doc_id, CAST(sum(l.li) AS DOUBLE) / 1000000.0 AS dsir_logw
FROM b JOIN l USING (bkt)
GROUP BY b.doc_id ORDER BY b.doc_id"""


def source_divergence(docs, k: int = 4096, source_col: str = "source"):
    """Per-source KL divergence from the corpus token distribution ->
    (source, kl_nats): how far each source's hashed-unigram distribution
    sits from the overall mix (add-one smoothed) — the mixing
    diagnostic a curation report reads next to temperature resampling.

    One pass: per-batch (source, bucket) histograms -> native
    groupby(source, bucket) Sum over sparse partials (the only shuffle,
    O(sources x K) merged rows); the driver reduces O(sources x K)
    cells. Each bucket's KL contribution rounds to integer NANO-nats
    BEFORE the per-source sum — identical doubles on both oracle sides,
    then an order-independent integer sum:

    ``kl_nats = sum_b round(1e9 * p_s[b] * ln(p_s[b]/p_c[b])) / 1e9``
    with ``p_s = (ct_s+1)/(n_s+K)``, ``p_c = (ct_c+1)/(n_c+K)``
    (corpus counts include every source's tokens).
    """
    import ray
    from ray.data.aggregate import Sum

    from .common import half_away_scaled_int

    class Hist:
        def __init__(self):
            self.bc = _BucketCounter(k)

        def __call__(self, b: pa.Table) -> pa.Table:
            empty = pa.table({"source": pa.array([], pa.string()),
                              "bkt": pa.array([], pa.int64()),
                              "ct": pa.array([], pa.int64())})
            if b.num_rows == 0:
                return empty
            srcs = np.asarray(b.column(source_col).to_pylist(), object)
            flat, lens = self.bc.batch_buckets(
                b.column("text").to_pylist())
            if flat.size == 0:
                return empty
            src_rep = np.repeat(srcs, lens)
            out_s, out_b, out_c = [], [], []
            for sname in np.unique(src_rep):     # few sources per batch
                h = np.bincount(flat[src_rep == sname], minlength=k)
                nz = np.flatnonzero(h)
                out_s.extend([sname] * nz.size)
                out_b.append(nz)
                out_c.append(h[nz])
            return pa.table({
                "source": pa.array(out_s, pa.string()),
                "bkt": pa.array(np.concatenate(out_b), pa.int64()),
                "ct": pa.array(np.concatenate(out_c).astype(np.int64),
                               pa.int64())})

    merged = docs.select_columns(["text", source_col]) \
        .map_batches(Hist, batch_format="pyarrow", concurrency=(1, 8)) \
        .groupby(["source", "bkt"]).aggregate(Sum("ct", alias_name="ct"))
    parts = [t for t in ray.get(merged.materialize().to_arrow_refs())
             if t.num_rows]
    if not parts:
        return pa.table({"source": pa.array([], pa.string()),
                         "kl_nats": pa.array([], pa.float64())})
    m = pa.concat_tables(parts)
    src = np.asarray(m.column("source").to_pylist(), object)
    bkt = m.column("bkt").to_numpy(zero_copy_only=False)
    ct = m.column("ct").cast(pa.int64()).to_numpy(zero_copy_only=False)

    corpus = np.zeros(k, np.int64)
    np.add.at(corpus, bkt, ct)
    n_c = int(corpus.sum())
    p_c = (corpus + 1.0) / (n_c + k)

    names = sorted(set(src.tolist()))
    out_s, out_kl = [], []
    for s in names:
        sel = src == s
        cs = np.zeros(k, np.int64)
        cs[bkt[sel]] = ct[sel]
        n_s = int(cs.sum())
        p_s = (cs + 1.0) / (n_s + k)
        contrib = half_away_scaled_int(p_s * np.log(p_s / p_c),
                                       1_000_000_000)
        out_s.append(s)
        out_kl.append(int(contrib.sum()) / 1_000_000_000.0)
    return pa.table({"source": pa.array(out_s, pa.string()),
                     "kl_nats": pa.array(out_kl, pa.float64())})


def source_divergence_sql(k: int, tokens_cte: str,
                          source_col: str = "source") -> str:
    """DuckDB mirror of :func:`source_divergence` (shared with tests)."""
    return f"""
WITH toks AS ({tokens_cte}),
b AS (SELECT d.{source_col} AS source,
             ('0x' || substr(md5(t.term), 1, 8))::BIGINT % {k} AS bkt
      FROM toks t JOIN documents d USING (doc_id)),
sb AS (SELECT source, bkt, count(*) AS ct FROM b GROUP BY source, bkt),
ns AS (SELECT source, sum(ct) AS n FROM sb GROUP BY source),
cb AS (SELECT bkt, sum(ct) AS ct FROM sb GROUP BY bkt),
nc AS (SELECT sum(ct) AS n FROM sb),
grid AS (SELECT ns.source, g.bkt, coalesce(sb.ct, 0) AS cs,
                coalesce(cb.ct, 0) AS cc, ns.n AS n_s, nc.n AS n_c
         FROM ns CROSS JOIN (SELECT unnest(range({k})) AS bkt) g
         CROSS JOIN nc
         LEFT JOIN sb ON sb.source = ns.source AND sb.bkt = g.bkt
         LEFT JOIN cb ON cb.bkt = g.bkt),
c AS (SELECT source,
             CAST(round((cs + 1.0) / (n_s + {k})
                        * ln( ((cs + 1.0) / (n_s + {k}))
                              / ((cc + 1.0) / (n_c + {k})) )
                        * 1000000000.0, 0) AS BIGINT) AS nano
      FROM grid)
SELECT source, CAST(sum(nano) AS DOUBLE) / 1000000000.0 AS kl_nats
FROM c GROUP BY source ORDER BY source"""
