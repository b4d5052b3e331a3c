"""Block-max WAND top-k (Broder et al. 2003; Ding & Suel 2011).

Document-at-a-time top-k over per-term posting arrays with per-term upper
bounds and per-block maxima for skipping. Produces *identical* results to the
exhaustive term-at-a-time scorer: pruning uses strict inequality against the
current k-th score, so threshold ties are never dropped, and final ranking
uses the shared (-score, doc_id) tie-break.
"""

from __future__ import annotations

import heapq
from typing import List, Sequence, Tuple

import numpy as np


class _Cursor:
    __slots__ = ("doc_ids", "scores", "block_last", "block_max", "pos", "n", "ub", "qw", "ord")

    def __init__(self, doc_ids: np.ndarray, scores: np.ndarray,
                 block_last: np.ndarray, block_max: np.ndarray, qw: float,
                 ord_idx: int = 0):
        self.doc_ids = doc_ids
        self.scores = scores
        self.block_last = block_last
        self.block_max = block_max
        self.qw = qw
        self.ord = ord_idx
        self.pos = 0
        self.n = doc_ids.size
        self.ub = float(block_max.max()) * qw if block_max.size else 0.0

    def cur(self) -> int:
        return int(self.doc_ids[self.pos]) if self.pos < self.n else (1 << 62)

    def seek(self, target: int):
        """Advance to the first doc_id >= target (galloping via searchsorted)."""
        if self.pos >= self.n:
            return
        self.pos += int(np.searchsorted(self.doc_ids[self.pos:], target, side="left"))

    def block_ub(self, doc: int) -> float:
        """Upper bound of the block containing the first doc_id >= doc."""
        if self.block_last.size == 0:
            return 0.0
        bi = int(np.searchsorted(self.block_last, doc, side="left"))
        if bi >= self.block_max.size:
            return 0.0
        return float(self.block_max[bi]) * self.qw

    def score_cur(self) -> float:
        return float(self.scores[self.pos])

    def advance(self):
        self.pos += 1


class _LazyCursor:
    """Block-skipping cursor over a SegmentReader term handle: decodes a
    block's postings (and scores them) only when the document-at-a-time loop
    actually lands in it — seeks driven by ``block_last`` move PAST blocks
    without any IO or decode (the point of the block-max layout)."""

    __slots__ = ("reader", "ti", "n", "B", "block_last", "block_max",
                 "score_fn", "qw", "ord", "ub", "pos", "_blk", "_ids", "_scores")

    def __init__(self, reader, handle, score_fn, qw: float, ord_idx: int):
        ti, df, n, block_last, block_max = handle
        self.reader = reader
        self.ti = ti
        self.n = int(n)
        self.B = int(reader.block_size)
        self.block_last = block_last
        self.block_max = block_max
        self.score_fn = score_fn
        self.qw = qw
        self.ord = ord_idx
        self.ub = float(block_max.max()) * qw if block_max.size else 0.0
        self.pos = 0
        self._blk = -1
        self._ids = None
        self._scores = None

    def _ensure(self):
        blk = self.pos // self.B
        if blk != self._blk:
            ids, tf, dl, imp = self.reader.decode_block(self.ti, blk)
            self._ids = ids
            self._scores = self.score_fn(tf, imp, dl)
            self._blk = blk

    def cur(self) -> int:
        if self.pos >= self.n:
            return 1 << 62
        self._ensure()
        return int(self._ids[self.pos - self._blk * self.B])

    def seek(self, target: int):
        if self.pos >= self.n:
            return
        bi = int(np.searchsorted(self.block_last, target, side="left"))
        if bi >= self.block_last.size:
            self.pos = self.n                  # past the last posting
            return
        if bi * self.B > self.pos:
            self.pos = bi * self.B             # whole blocks skipped, no IO
        self._ensure()
        local = self.pos - self._blk * self.B
        self.pos = self._blk * self.B + local + int(
            np.searchsorted(self._ids[local:], target, side="left"))

    def block_ub(self, doc: int) -> float:
        if self.block_last.size == 0:
            return 0.0
        bi = int(np.searchsorted(self.block_last, doc, side="left"))
        if bi >= self.block_max.size:
            return 0.0
        return float(self.block_max[bi]) * self.qw

    def score_cur(self) -> float:
        self._ensure()
        return float(self._scores[self.pos - self._blk * self.B])

    def advance(self):
        self.pos += 1


def wand_topk(term_postings: Sequence[Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, float]],
              k: int, block_size: int = 128) -> List[Tuple[int, float]]:
    """term_postings: per query term (doc_ids asc, scores, block_last,
    block_max, query_weight). Returns [(doc_id, score)] ranked by
    (-score, doc_id)."""
    cursors = [_Cursor(*tp, ord_idx=i) for i, tp in enumerate(term_postings) if tp[0].size]
    return [(d, s) for d, s, _ in wand_topk_cursors(cursors, k)]


def wand_topk_cursors(cursors, k: int):
    """Generic WAND loop over cursor objects (eager or lazy, mixable).

    Returns [(doc_id, score, matched_ords)] ranked by (-score, doc_id) —
    matched_ords are the ``ord`` tags of the cursors that contained the doc
    (free here; the lazy path would otherwise need extra decodes for
    matched-terms assembly)."""
    if not cursors:
        return []
    heap: List[Tuple[float, int]] = []   # (score, -doc_id) min-heap of top-k
    theta = -np.inf

    while True:
        cursors = [c for c in cursors if c.pos < c.n]
        if not cursors:
            break
        cursors.sort(key=lambda c: c.cur())
        # pivot: smallest prefix whose ub sum could beat theta (strict)
        # ties: a doc scoring exactly theta can still win the doc_id
        # tie-break, so pruning uses strict '<' everywhere (>= to continue)
        acc = 0.0
        pivot_idx = -1
        for i, c in enumerate(cursors):
            acc += c.ub
            if acc >= theta:
                pivot_idx = i
                break
        if pivot_idx < 0:
            break  # no document can beat theta any more
        pivot_doc = cursors[pivot_idx].cur()

        # block-max refinement (BMW): bound the docs in [pivot_doc, d'] where
        # d' is the earliest block boundary among the prefix cursors, capped
        # by the next cursor's current doc. If even the block maxima cannot
        # reach theta there, every prefix cursor can skip to d'+1.
        bub = 0.0
        d_prime = (1 << 62)
        for c in cursors[: pivot_idx + 1]:
            bub += c.block_ub(pivot_doc)
            bi = int(np.searchsorted(c.block_last, pivot_doc, side="left"))
            if bi < c.block_last.size:
                d_prime = min(d_prime, int(c.block_last[bi]))
        if pivot_idx + 1 < len(cursors):
            d_prime = min(d_prime, cursors[pivot_idx + 1].cur() - 1)
        if bub < theta and d_prime >= pivot_doc:
            # DEEP skip: keep extending the target across consecutive block
            # ranges whose summed bounds still cannot reach theta. This is
            # metadata-only (block_last/block_max lookups — no decode), so a
            # lazy cursor jumps a long sub-theta run in one seek instead of
            # decoding every intermediate block just to re-sort on cur().
            cap = (cursors[pivot_idx + 1].cur() - 1
                   if pivot_idx + 1 < len(cursors) else (1 << 62))
            target = d_prime + 1
            while target <= cap:
                nb_bub = 0.0
                nd = 1 << 62
                for c in cursors[: pivot_idx + 1]:
                    nb_bub += c.block_ub(target)
                    bi = int(np.searchsorted(c.block_last, target, side="left"))
                    if bi < c.block_last.size:
                        nd = min(nd, int(c.block_last[bi]))
                if nb_bub >= theta or nd >= cap:
                    break
                target = nd + 1
            for c in cursors[: pivot_idx + 1]:
                if c.cur() < target:
                    c.seek(target)
            continue

        if cursors[0].cur() == pivot_doc:
            # fully evaluate pivot_doc. Contributions are summed in the
            # ORIGINAL term order (cursor.ord), not the dynamic cursor-sorted
            # order: FP addition is order-sensitive, and TAAT's bincount adds
            # per-term partials in term_postings order — summing in any other
            # order can flip exact-score ties at the k boundary.
            hits = []
            for c in cursors:
                if c.cur() == pivot_doc:
                    hits.append(c)
                elif c.cur() > pivot_doc:
                    break
            hits.sort(key=lambda c: c.ord)
            score = 0.0
            for c in hits:
                score += c.score_cur() * c.qw
                c.advance()
            entry = (score, -pivot_doc, tuple(c.ord for c in hits))
            if len(heap) < k:
                heapq.heappush(heap, entry)
                if len(heap) == k:
                    theta = heap[0][0]
            elif entry[:2] > heap[0][:2]:
                heapq.heapreplace(heap, entry)
                theta = heap[0][0]
        else:
            # align: move cursors before the pivot up to it
            for c in cursors[:pivot_idx]:
                c.seek(pivot_doc)

    out = [(-nd, s, ords) for s, nd, ords in heap]
    out.sort(key=lambda x: (-x[1], x[0]))
    return out
