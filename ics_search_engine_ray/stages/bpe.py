"""Distributed BPE tokenizer training + encoding (Sennrich et al. 2016,
"Neural Machine Translation of Rare Words with Subword Units",
arXiv:1508.07909) — the tokenizer-training stage of an LLM data pipeline.

The classic scale trick: merges operate on the DISTINCT-WORD frequency
table (one corpus pass builds it; every later pass is vocab-sized, not
corpus-sized). Training:

- pass 1: per-batch (word, n) partials -> native ``groupby("word").Sum``
  (term-hash shuffle, parallel aggregators — never a single reducer).
- below ``word_gate`` the word table collects to the driver once and the
  merge loop runs locally with incremental pair-count maintenance (the
  textbook O(pairs-touched) update), which is exact and fast.
- ABOVE the gate the word table stays a materialized Dataset and each
  merge runs distributed: a pair-count ``map_batches`` partial ->
  ``groupby(a, b).Sum`` -> per-block top-1 partials -> driver argmax of
  O(blocks) rows; the winning pair broadcasts and an apply pass rewrites
  only the words containing it. Both paths are tie-broken identically
  (max count, then lexicographic (a, b)) and tested equivalent.

Words are lowercase [a-z0-9]+ tokens (the SQL-replicable stream) split
into characters with a terminal ``</w>`` end-of-word symbol (Sennrich's
marker, so merges can't cross word boundaries and decoding is exact).

Encoding replays the learned merges per word in rank order with a
per-batch word->encoding memo (webtext words repeat heavily), emitting
per-doc BPE token counts.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np
import pyarrow as pa

from ..functions.tokenizer import TOKEN_RE

_EOW = "</w>"

# above this many distinct words, training switches to the distributed
# per-merge passes (repo hard rule: driver collections are size-gated)
_WORD_GATE = 2_000_000


def _word_counts(docs):
    """(word, n) relation via per-batch partials + native groupby Sum."""
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        texts = b.column("text").to_pylist()
        toks = [t for x in texts
                for t in TOKEN_RE.findall((x or "").lower())
                if len(t) > 1]
        if not toks:
            return pa.table({"word": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        u, c = np.unique(np.asarray(toks, object), return_counts=True)
        return pa.table({"word": pa.array(u, pa.string()),
                         "n": pa.array(c.astype(np.int64), pa.int64())})

    merged = docs.select_columns(["text"]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby("word").aggregate(Sum("n", alias_name="n"))
    return merged.map_batches(
        lambda b: pa.table({"word": b.column("word"),
                            "n": b.column("n").cast(pa.int64())}),
        batch_format="pyarrow").materialize()


def _syms(word: str) -> Tuple[str, ...]:
    return tuple(word) + (_EOW,)


def _merge_word(syms: Tuple[str, ...], a: str, b: str) -> Tuple[str, ...]:
    """Replace every non-overlapping (a, b) adjacency left-to-right."""
    out: List[str] = []
    i, n = 0, len(syms)
    while i < n:
        if i + 1 < n and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def _pairs_of(syms: Tuple[str, ...]) -> Dict[Tuple[str, str], int]:
    d: Dict[Tuple[str, str], int] = {}
    for p in zip(syms, syms[1:]):
        d[p] = d.get(p, 0) + 1
    return d


def train_bpe_local(words: List[str], counts: List[int], n_merges: int,
                    min_count: int = 2) -> List[Tuple[str, str, int]]:
    """Sequential exact BPE on a (word, count) table with incremental
    pair-count maintenance -> [(a, b, pair_count)] in merge order.
    Deterministic tie-break: max count, then lexicographic (a, b)."""
    seqs = [_syms(w) for w in words]
    pair_cnt: Dict[Tuple[str, str], int] = {}
    pair_words: Dict[Tuple[str, str], set] = {}
    for wi, (s, c) in enumerate(zip(seqs, counts)):
        for p, k in _pairs_of(s).items():
            pair_cnt[p] = pair_cnt.get(p, 0) + k * c
            pair_words.setdefault(p, set()).add(wi)
    merges: List[Tuple[str, str, int]] = []
    for _ in range(n_merges):
        if not pair_cnt:
            break
        best = min(pair_cnt.items(), key=lambda kv: (-kv[1], kv[0]))
        (a, b), cnt = best
        if cnt < min_count:
            break
        merges.append((a, b, cnt))
        for wi in list(pair_words.get((a, b), ())):
            old, c = seqs[wi], counts[wi]
            new = _merge_word(old, a, b)
            for p, k in _pairs_of(old).items():
                pair_cnt[p] -= k * c
                if pair_cnt[p] <= 0:
                    pair_cnt.pop(p, None)
                ws = pair_words.get(p)
                if ws is not None:
                    ws.discard(wi)
                    if not ws:
                        pair_words.pop(p, None)
            for p, k in _pairs_of(new).items():
                pair_cnt[p] = pair_cnt.get(p, 0) + k * c
                pair_words.setdefault(p, set()).add(wi)
            seqs[wi] = new
    return merges


def _train_bpe_distributed(word_tbl, n_merges: int, min_count: int):
    """Per-merge distributed passes over the (word-as-symbol-list, n)
    Dataset: pair-count partials -> groupby(a, b) Sum -> per-block top-1
    -> driver argmax (O(blocks) rows); apply pass rewrites affected
    words. The word relation shuffles ONCE (initial groupby); each
    iteration is two narrow map passes plus one pair-keyed aggregate of
    per-batch-distinct rows."""
    import ray
    from ray.data.aggregate import Sum

    def explode(b: pa.Table) -> pa.Table:
        words = b.column("word").to_pylist()
        return pa.table({
            "syms": pa.array([list(_syms(w)) for w in words],
                             pa.list_(pa.string())),
            "n": b.column("n")})

    cur = word_tbl.map_batches(explode, batch_format="pyarrow").materialize()
    merges: List[Tuple[str, str, int]] = []
    empty_pc = pa.table({"a": pa.array([], pa.string()),
                         "b": pa.array([], pa.string()),
                         "c": pa.array([], pa.int64())})

    def pair_partial(b: pa.Table) -> pa.Table:
        seqs = b.column("syms").to_pylist()
        ns = b.column("n").to_numpy(zero_copy_only=False)
        acc: Dict[Tuple[str, str], int] = {}
        for s, c in zip(seqs, ns.tolist()):
            for p, k in _pairs_of(tuple(s)).items():
                acc[p] = acc.get(p, 0) + k * c
        if not acc:
            return empty_pc
        ks = list(acc.keys())
        return pa.table({
            "a": pa.array([p[0] for p in ks], pa.string()),
            "b": pa.array([p[1] for p in ks], pa.string()),
            "c": pa.array([acc[p] for p in ks], pa.int64())})

    def local_top1(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return empty_pc
        av = np.asarray(b.column("a").to_pylist(), object)
        bv = np.asarray(b.column("b").to_pylist(), object)
        cv = b.column("c").to_numpy(zero_copy_only=False)
        i = int(np.lexsort((bv, av, -cv))[0])
        return pa.table({"a": pa.array([av[i]], pa.string()),
                         "b": pa.array([bv[i]], pa.string()),
                         "c": pa.array([int(cv[i])], pa.int64())})

    for _ in range(n_merges):
        tops = cur.map_batches(pair_partial, batch_format="pyarrow") \
            .groupby(["a", "b"]).aggregate(Sum("c", alias_name="c")) \
            .map_batches(lambda t: local_top1(pa.table({
                "a": t.column("a"), "b": t.column("b"),
                "c": t.column("c").cast(pa.int64())})),
                batch_format="pyarrow").take_all()
        if not tops:
            break
        best = min(tops, key=lambda r: (-r["c"], r["a"], r["b"]))
        a, b_, cnt = best["a"], best["b"], int(best["c"])
        if cnt < min_count:
            break
        merges.append((a, b_, cnt))
        pair_ref = ray.put((a, b_))

        def apply(t: pa.Table) -> pa.Table:
            aa, bb = ray.get(pair_ref)
            seqs = t.column("syms").to_pylist()
            out = []
            for s in seqs:
                # fast reject: the pair's fused string must appear in the
                # joined symbols for a rewrite to be possible
                if aa in s and bb in s:
                    out.append(list(_merge_word(tuple(s), aa, bb)))
                else:
                    out.append(s)
            return pa.table({"syms": pa.array(out, pa.list_(pa.string())),
                             "n": t.column("n")})

        cur = cur.map_batches(apply, batch_format="pyarrow").materialize()
    return merges


def bpe_merges(docs, n_merges: int = 50, min_count: int = 2,
               word_gate: int = _WORD_GATE):
    """Train BPE on the corpus -> Dataset (rank, a, b, n): the learned
    merge table in order. Word-count pass is always distributed; the
    merge loop collects the word table below ``word_gate`` (exact
    incremental algorithm) and runs per-merge distributed passes above
    it — identical outputs, tested equivalent."""
    import ray.data as rd

    wt = _word_counts(docs)
    empty = pa.table({"rank": pa.array([], pa.int64()),
                      "a": pa.array([], pa.string()),
                      "b": pa.array([], pa.string()),
                      "n": pa.array([], pa.int64())})
    n_words = wt.count()
    if n_words == 0:
        return rd.from_arrow(empty)
    if n_words <= word_gate:
        rows = wt.take_all()
        merges = train_bpe_local([r["word"] for r in rows],
                                 [r["n"] for r in rows],
                                 n_merges, min_count)
    else:
        merges = _train_bpe_distributed(wt, n_merges, min_count)
    if not merges:
        return rd.from_arrow(empty)
    return rd.from_arrow(pa.table({
        "rank": pa.array(np.arange(len(merges), dtype=np.int64), pa.int64()),
        "a": pa.array([m[0] for m in merges], pa.string()),
        "b": pa.array([m[1] for m in merges], pa.string()),
        "n": pa.array([m[2] for m in merges], pa.int64())}))


def encode_word(word: str, ranks: Dict[Tuple[str, str], int]) -> Tuple[str, ...]:
    """Greedy lowest-rank-first merge replay (the standard BPE encoder)."""
    syms = _syms(word)
    while len(syms) > 1:
        best_rank, best_pair = None, None
        for p in zip(syms, syms[1:]):
            r = ranks.get(p)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_pair = r, p
        if best_pair is None:
            break
        syms = _merge_word(syms, best_pair[0], best_pair[1])
    return syms


def bpe_encode(docs, merges_rows: List[dict]):
    """Encode each doc with a learned merge table -> (doc_id,
    n_words, n_bpe_tokens): per-doc BPE token counts. The merge table
    (the model — O(n_merges), tiny) broadcasts via the closure; each
    batch keeps a word->length memo since webtext words repeat heavily.
    """
    ranks = {(r["a"], r["b"]): int(r["rank"]) for r in merges_rows}

    def enc(b: pa.Table) -> pa.Table:
        texts = b.column("text").to_pylist()
        memo: Dict[str, int] = {}
        n_words = np.zeros(len(texts), np.int64)
        n_tok = np.zeros(len(texts), np.int64)
        for i, x in enumerate(texts):
            toks = [t for t in TOKEN_RE.findall((x or "").lower())
                    if len(t) > 1]
            n_words[i] = len(toks)
            s = 0
            for w in toks:
                ln = memo.get(w)
                if ln is None:
                    ln = len(encode_word(w, ranks))
                    memo[w] = ln
                s += ln
            n_tok[i] = s
        return pa.table({
            "doc_id": b.column("doc_id"),
            "n_words": pa.array(n_words, pa.int64()),
            "n_bpe_tokens": pa.array(n_tok, pa.int64())})

    return docs.select_columns(["doc_id", "text"]) \
        .map_batches(enc, batch_format="pyarrow")
