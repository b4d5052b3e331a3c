"""Edit-distance-1 fuzzy pair detection via deletion-neighborhood blocking.

The record-linkage / typo-dedup primitive the exact+shingle families
can't express: report every pair of documents whose blocking key (a
short prefix / title field) is within Levenshtein distance <= 1.

Blocking is the SymSpell deletion-neighborhood scheme (Garbe; same
family as FastSS, Bocek et al. 2007): each key emits itself plus its
len(key) one-character-deletion variants. Two keys within edit
distance 1 ALWAYS share a variant (equal -> self; substitution at i ->
both minus position i; indel -> the longer minus the inserted char),
so a variant-hash groupby is a COMPLETE candidate generator — no
recall loss — at a bounded (L+1)-fold key blowup, after which every
candidate pair is verified exactly. Quadratic groups only arise from
identical keys, i.e. genuine dist-0 cliques (run exact_dedup first if
those dominate).

Everything is vectorized: variant hashes come from one padded-matrix
polynomial pass (delete-column-j hashes derived from prefix sums of the
full-key hash — no per-variant string slicing), verification from
lcp/lcs column scans. Byte-level distance == character-level for ASCII
keys (the oracle's DuckDB ``levenshtein`` is character-level; the
driver query uses ASCII prefixes where both coincide).
"""

from __future__ import annotations

from typing import List

import numpy as np
import pyarrow as pa

from ..functions.wordhash import _splitmix

_P = np.uint64(0x100000001B3)
_PINV = np.uint64(pow(0x100000001B3, -1, 1 << 64))
_LEN_SALT = np.uint64(0xD6E8FEB86659FD93)

_PAIR_SCHEMA = pa.schema([("a", pa.int64()), ("b", pa.int64()),
                          ("dist", pa.int64())])


def _pad_matrix(keys: List[str], L: int):
    """(n, L) uint8 matrix of UTF-8 bytes (0-padded) + int64 lengths.
    Keys longer than L bytes are truncated (callers slice first)."""
    n = len(keys)
    mat = np.zeros((n, L), np.uint8)
    lens = np.empty(n, np.int64)
    for i, s in enumerate(keys):
        b = s.encode("utf-8")[:L]
        lens[i] = len(b)
        mat[i, :len(b)] = np.frombuffer(b, np.uint8)
    return mat, lens


def _variant_hashes(mat: np.ndarray, lens: np.ndarray) -> np.ndarray:
    """(n, L+1) uint64: column j<L = hash of key minus char j (valid only
    where j < len), column L = hash of the key itself. Equal variant
    STRINGS hash equal across parents of different lengths: every padded
    polynomial is renormalized to its canonical own-length form by
    PINV^(pad), then salted with the variant length."""
    n, L = mat.shape
    with np.errstate(over="ignore"):
        pw = np.empty(L, np.uint64)          # pw[c] = P^(L-1-c)
        pw[L - 1] = np.uint64(1)
        for c in range(L - 2, -1, -1):
            pw[c] = pw[c + 1] * _P
        pinv_pow = np.empty(L + 1, np.uint64)  # PINV^e
        pinv_pow[0] = np.uint64(1)
        for e in range(1, L + 1):
            pinv_pow[e] = pinv_pow[e - 1] * _PINV
        w = mat.astype(np.uint64) * pw[None, :]         # (n, L)
        pref = np.zeros((n, L + 1), np.uint64)          # pref[:, j] = sum c<j
        np.cumsum(w, axis=1, out=pref[:, 1:])
        full = pref[:, L]
        # delete col j: prefix keeps weights shifted up one power, suffix
        # (c > j) keeps its padded weight -> uniform padded-(L-1) poly
        hj = pref[:, :L] * _PINV + (full[:, None] - pref[:, 1:])
        canon_del = hj * pinv_pow[L - lens][:, None]        # var len l-1
        canon_id = full * pinv_pow[L - lens]                # var len l
        out = np.empty((n, L + 1), np.uint64)
        out[:, :L] = _splitmix(
            canon_del + (lens - 1).astype(np.uint64)[:, None] * _LEN_SALT)
        out[:, L] = _splitmix(canon_id + lens.astype(np.uint64) * _LEN_SALT)
        return out


def _verify_pairs(mat: np.ndarray, lens: np.ndarray, ia: np.ndarray,
                  ib: np.ndarray) -> np.ndarray:
    """dist int64 per candidate pair (rows ia vs ib of mat): 0, 1, or
    2 (= 'more than 1', rejected). lcp/lcs column scans, no DP."""
    n = ia.size
    if n == 0:
        return np.empty(0, np.int64)
    la, lb = lens[ia], lens[ib]
    # orient: A the longer (or equal) side
    swap = la < lb
    A = np.where(swap[:, None], mat[ib], mat[ia])
    B = np.where(swap[:, None], mat[ia], mat[ib])
    LA = np.maximum(la, lb)
    LB = np.minimum(la, lb)
    dist = np.full(n, 2, np.int64)
    diff = A != B                                   # padded compare
    neq = diff.any(axis=1)
    same_len = LA == LB
    # equal length: dist <= 1  <=>  hamming <= 1
    ham = diff.sum(axis=1)
    dist[same_len & (ham == 0)] = 0
    dist[same_len & (ham == 1)] = 1
    # length diff 1: dist == 1  <=>  lcp + lcs >= shorter length
    off1 = LA == LB + 1
    if off1.any():
        idx = np.flatnonzero(off1)
        L = mat.shape[1]
        d = diff[idx]
        lcp = np.where(d.any(axis=1), d.argmax(axis=1), L)
        # right-aligned compare: A[la-1-k] vs B[lb-1-k]
        cols = np.arange(L)
        ra = np.take_along_axis(
            A[idx], (LA[idx, None] - 1 - cols[None, :]) % L, axis=1)
        rb = np.take_along_axis(
            B[idx], (LB[idx, None] - 1 - cols[None, :]) % L, axis=1)
        rd = ra != rb
        lcs = np.where(rd.any(axis=1), rd.argmax(axis=1), L)
        lcs = np.minimum(lcs, LB[idx])
        ok = (np.minimum(lcp, LB[idx]) + lcs) >= LB[idx]
        dist[idx[ok]] = 1
    _ = neq  # (document: neq unused; ham==0 covers exact equality)
    return dist


def _prefix_sortv(texts: List[str]) -> np.ndarray:
    """int64 big-endian integer of the first 8 UTF-8 bytes (0-padded) —
    a numeric total order equal to lexicographic byte order of the
    8-char prefix (== character order for ASCII; the SQL twin is a
    codepoint polynomial)."""
    n = len(texts)
    out = np.zeros((n, 8), np.uint8)
    for i, t in enumerate(texts):
        b = (t or "").encode("utf-8")[:8]
        out[i, :len(b)] = np.frombuffer(b, np.uint8)
    return (out.astype(np.uint64) *
            (np.uint64(256) ** np.arange(7, -1, -1, dtype=np.uint64))
            ).sum(axis=1).view(np.int64)


def snm_pairs(docs, window: int = 8, shingle_k: int = 3,
              threshold: float = 0.5):
    """Sorted-neighborhood near-dup pairs (Hernandez & Stolfo 1995):
    rank all docs by an 8-byte text-prefix key, take every pair within
    ``window`` rank positions as a candidate, verify by EXACT distinct
    word-``shingle_k``-gram Jaccard >= ``threshold``. The sort-based
    complement to hash blocking (edit_distance_pairs) and banding
    (minhash/simhash): catches near-dups that cluster under the sort
    key even when no variant/band collides.

    Plan: stages/rank.py global_rank (equi-depth bins + prefix sums —
    no global sort materialization) -> rank joined back by a doc_id
    co-partition -> each doc emits to rank-buckets r//w and r//w-1 ->
    groupby(bucket) generates in-window pairs and verifies them with
    per-doc distinct shingle-hash sets (functions/wordhash.py, the
    ngram_jaccard hashing) -> final groupby((a, b)) collapses the
    <=2x bucket-overlap rediscovery. Per-task pair work is O(w^2) by
    construction — bounded by the window, never by corpus size."""
    from ..functions.wordhash import batch_shingle_hashes
    from .rank import global_rank

    w = int(window)
    out_schema = pa.schema([("a", pa.int64()), ("b", pa.int64()),
                            ("jaccard", pa.float64())])

    def keyed(b: pa.Table) -> pa.Table:
        texts = [x or "" for x in b.column("text").to_pylist()]
        return pa.table({
            "doc_id": b.column("doc_id"),
            "sortv": pa.array(_prefix_sortv(texts), pa.int64())})

    ranks = global_rank(docs.map_batches(keyed, batch_format="pyarrow"),
                        value_col="sortv", id_col="doc_id")

    # join rank back to text: tagged doc_id % G co-partition + run scan
    # (the dedup_against pattern — COARSE groups, never per-doc groups)
    G = 64

    def tag_rank(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_numpy(zero_copy_only=False)
        return pa.table({
            "_g": pa.array((ids % G + G) % G, pa.int64()),
            "doc_id": b.column("doc_id"),
            "_side": pa.array(np.zeros(b.num_rows, np.int8), pa.int8()),
            "rank": b.column("rank"),
            "text": pa.array([""] * b.num_rows, pa.string())})

    def tag_doc(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_numpy(zero_copy_only=False)
        return pa.table({
            "_g": pa.array((ids % G + G) % G, pa.int64()),
            "doc_id": b.column("doc_id"),
            "_side": pa.array(np.ones(b.num_rows, np.int8), pa.int8()),
            "rank": pa.array(np.zeros(b.num_rows, np.int64), pa.int64()),
            "text": b.column("text")})

    joined_in = ranks.map_batches(tag_rank, batch_format="pyarrow") \
        .union(docs.map_batches(tag_doc, batch_format="pyarrow"))

    _J_SCHEMA = pa.schema([("bucket", pa.int64()), ("doc_id", pa.int64()),
                           ("rank", pa.int64()), ("text", pa.string())])

    def join_emit(g: pa.Table) -> pa.Table:
        # each doc_id run carries one rank row (side 0) + one text row
        if g.num_rows == 0:
            return _J_SCHEMA.empty_table()
        side = g.column("_side").to_numpy(zero_copy_only=False)
        ids = g.column("doc_id").to_numpy(zero_copy_only=False)
        order = np.lexsort((side, ids))
        ids_s = ids[order]
        start = np.flatnonzero(np.concatenate(
            ([True], ids_s[1:] != ids_s[:-1])))
        rpos = order[start]                      # rank row (side 0 first)
        tpos = order[np.minimum(start + 1, order.size - 1)]
        ranks_ = g.column("rank").to_numpy(zero_copy_only=False)[rpos]
        texts_ = g.column("text").take(pa.array(tpos, pa.int64()))
        # COARSE chunks of B consecutive ranks (never per-window groups);
        # low-fringe rows (rank % B <= w-2) also feed the previous chunk
        B = w * 256
        sb = ranks_ // B
        fringe = np.flatnonzero((ranks_ % B <= w - 2) & (sb > 0))
        out_bucket = np.concatenate([sb, sb[fringe] - 1])
        keep = pa.array(np.concatenate(
            [np.arange(start.size), fringe]), pa.int64())
        return pa.table({
            "bucket": pa.array(out_bucket, pa.int64()),
            "doc_id": pa.array(np.concatenate(
                [ids_s[start], ids_s[start][fringe]]), pa.int64()),
            "rank": pa.array(np.concatenate(
                [ranks_, ranks_[fringe]]), pa.int64()),
            "text": texts_.take(keep)})

    bucketed = joined_in.groupby("_g").map_groups(
        join_emit, batch_format="pyarrow")

    def pairs_in_bucket(g: pa.Table) -> pa.Table:
        m = g.num_rows
        if m < 2:
            return out_schema.empty_table()
        B = w * 256
        sb = int(g.column("bucket")[0].as_py())
        rk = g.column("rank").to_numpy(zero_copy_only=False)
        ids = g.column("doc_id").to_numpy(zero_copy_only=False)
        texts = g.column("text").to_pylist()
        flat, offs = batch_shingle_hashes(texts, shingle_k)
        sets = [np.unique(flat[offs[i]:offs[i + 1]]) for i in range(m)]
        order = np.argsort(rk, kind="stable")
        aa, bb, jj = [], [], []
        for x in range(m):                    # O(w) pairs per row
            i = order[x]
            if rk[i] // B != sb:
                continue                      # fringe rows never own pairs
            for y in range(x + 1, m):
                j2 = order[y]
                if rk[j2] - rk[i] >= w:
                    break
                inter = np.intersect1d(sets[i], sets[j2],
                                       assume_unique=True).size
                union = sets[i].size + sets[j2].size - inter
                jac = inter / union if union else 0.0
                if jac >= threshold - 1e-12:
                    lo, hi = (ids[i], ids[j2]) if ids[i] < ids[j2] \
                        else (ids[j2], ids[i])
                    aa.append(lo)
                    bb.append(hi)
                    jj.append(round(float(np.round(jac, 6)), 6))
        return pa.table({"a": pa.array(aa, pa.int64()),
                         "b": pa.array(bb, pa.int64()),
                         "jaccard": pa.array(jj, pa.float64())})

    # pair ownership is unique (the LEFT rank's own chunk emits it), so
    # no cross-chunk dedupe pass is needed
    return bucketed.groupby("bucket").map_groups(
        pairs_in_bucket, batch_format="pyarrow")


def edit_distance_pairs(docs, key_len: int = 16, key_column: str = "text"):
    """documents -> (a, b, dist) for every doc pair whose first
    ``key_len`` characters of ``key_column`` are within Levenshtein
    distance 1 (a < b; dist in {0, 1}; exact, zero recall loss).

    Plan: per-batch padded-matrix variant hashing (L+1 rows per doc) ->
    ONE groupby(variant) with in-group vectorized verification -> ONE
    tiny groupby((a, b)) min(dist) to collapse multi-variant rediscovery
    of the same pair. Only (hash, doc_id, key<=key_len chars) rows
    shuffle; candidate groups are variant-equal keys, so group sizes
    track true near-clique sizes, not corpus size."""
    L = key_len

    def emit(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return pa.schema([("vh", pa.int64()), ("doc_id", pa.int64()),
                              ("key", pa.string())]).empty_table()
        keys = [(x or "")[:L] for x in
                batch.column(key_column).to_pylist()]
        mat, lens = _pad_matrix(keys, L)
        vh = _variant_hashes(mat, lens)                 # (n, L+1)
        valid = np.zeros((n, L + 1), bool)
        valid[:, L] = True
        cols = np.arange(L)[None, :]
        valid[:, :L] = cols < lens[:, None]
        r, c = np.nonzero(valid)
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        return pa.table({
            "vh": pa.array(vh[r, c].view(np.int64), pa.int64()),
            "doc_id": pa.array(ids[r], pa.int64()),
            "key": pa.array([keys[i] for i in r], pa.string())})

    def candidates(g: pa.Table) -> pa.Table:
        ids = g.column("doc_id").to_numpy(zero_copy_only=False)
        uniq, first = np.unique(ids, return_index=True)
        if uniq.size < 2:
            return _PAIR_SCHEMA.empty_table()
        keys = [g.column("key")[int(i)].as_py() for i in first]
        mat, lens = _pad_matrix(keys, L)
        m = uniq.size
        iu, il = np.triu_indices(m, k=1)
        dist = _verify_pairs(mat, lens, iu, il)
        keep = dist <= 1
        return pa.table({"a": pa.array(uniq[iu[keep]], pa.int64()),
                         "b": pa.array(uniq[il[keep]], pa.int64()),
                         "dist": pa.array(dist[keep], pa.int64())})

    pairs = docs.map_batches(emit, batch_format="pyarrow") \
        .groupby("vh").map_groups(candidates, batch_format="pyarrow")

    def fin(b: pa.Table) -> pa.Table:
        return pa.table({"a": b.column("a"), "b": b.column("b"),
                         "dist": b.column("min(dist)")})

    return pairs.groupby(["a", "b"]).min("dist") \
        .map_batches(fin, batch_format="pyarrow")
