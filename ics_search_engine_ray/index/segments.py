"""Compressed posting segments: the on-disk index format.

Replaces the reference's pickle-records + seek-map pair
(utils/index_generator.py:18-61, search.py:35-61) with the north-star format:
per term-hash partition, one binary segment of delta+varint-compressed posting
streams plus a Parquet term dictionary holding per-term stream offsets, df,
and block-max/skip metadata (Ding & Suel 2011). One partition = one resumable
checkpoint unit.

Layout per partition (three files):
- ``part-{p:05d}.seg``          — six concatenated byte streams:
    ids   : per-term delta + varint doc_ids (ascending within term)
    tf    : varint term frequencies
    dl    : varint doc lengths (carried through the pipeline: no docmeta join)
    imp   : varint of importance*4 when exactly representable, else raw f32
    npos  : varint positions-count per posting
    pos   : per-posting delta + varint positions
- ``part-{p:05d}.terms.parquet`` — per-term: df, n, (offset, length) per
    stream, block_last (list<int64>), block_max (list<float32>)
- ``part-{p:05d}.done.json``     — manifest entry: counts, bytes, input
    fingerprint, wall time (lineage + metrics; presence == partition complete)

Everything in the builder is numpy-vectorized across the *whole partition*:
per-value varint byte lengths are computed columnwise, so per-term offsets are
cumsum slices — no per-term encode calls in the hot path.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass
from typing import Dict, Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from ..config import EngineConfig, DEFAULT_CONFIG
from ..functions.memtune import tune_malloc
from ..functions.varint import encode_varints, decode_varints
from .scoring import bm25_scores

_STREAMS = ("ids", "tf", "dl", "imp", "npos", "pos")


def _varint_lengths(v: np.ndarray) -> np.ndarray:
    """Byte length of the LEB128 encoding of each uint64 value."""
    v = v.astype(np.uint64)
    out = np.ones(v.shape[0], dtype=np.int64)
    for k in range(1, 10):
        out += (v >= (np.uint64(1) << np.uint64(7 * k))).astype(np.int64)
    return out


def _delta_with_resets(vals: np.ndarray, start_mask: np.ndarray) -> np.ndarray:
    """Delta-encode, restarting (absolute value) wherever start_mask is True."""
    v = vals.astype(np.uint64)
    if v.size == 0:
        return v
    d = v.copy()
    d[1:] = v[1:] - v[:-1]
    d[start_mask] = v[start_mask]
    return d


@dataclass
class TermPostings:
    term: str
    df: int
    doc_ids: np.ndarray      # int64, ascending
    tf: np.ndarray           # int64
    doclen: np.ndarray       # int64
    importance: np.ndarray   # float64
    positions: Optional[list]  # list of np arrays (lazy; None if not decoded)
    block_last: np.ndarray   # int64 per block
    block_max: np.ndarray    # float32 per block


def write_segment(part_id: int, tbl: pa.Table, out_dir: str,
                  num_docs: int, avgdl: float,
                  head_df: Optional[Dict[str, int]] = None,
                  cfg: EngineConfig = DEFAULT_CONFIG,
                  input_fingerprint: str = "") -> dict:
    """Build + atomically write one partition segment from its doc_terms rows.

    ``tbl`` columns: doc_id, term, tf, importance, positions, doclen.
    Returns the manifest row (also persisted as the .done.json marker).
    """
    tune_malloc()
    t0 = time.time()
    os.makedirs(out_dir, exist_ok=True)
    base = os.path.join(out_dir, f"part-{part_id:05d}")

    tbl = tbl.sort_by([("term", "ascending"), ("doc_id", "ascending")])
    n = tbl.num_rows

    terms = tbl.column("term").combine_chunks()
    enc = pc.dictionary_encode(terms)
    chunk = enc.chunk(0) if isinstance(enc, pa.ChunkedArray) else enc
    codes = chunk.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    vocab = chunk.dictionary.to_pylist()

    doc_ids = tbl.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
    tf = tbl.column("tf").to_numpy(zero_copy_only=False).astype(np.int64)
    imp = tbl.column("importance").to_numpy(zero_copy_only=False).astype(np.float64)
    dl = tbl.column("doclen").to_numpy(zero_copy_only=False).astype(np.int64)

    if n == 0:
        term_tbl = _empty_terms_table()
        pq.write_table(term_tbl, base + ".terms.parquet")
        open(base + ".seg", "wb").close()
        row = _manifest_row(part_id, 0, 0, 0, input_fingerprint, t0,
                            block_size=cfg.posting_block_size)
        _write_done(base, row)
        return row

    # term run boundaries (sorted, so codes are grouped; NOT monotone per se)
    start_mask = np.empty(n, dtype=bool)
    start_mask[0] = True
    start_mask[1:] = codes[1:] != codes[:-1]
    starts = np.flatnonzero(start_mask)                  # per-run start row
    run_codes = codes[starts]
    counts = np.diff(np.append(starts, n))               # postings per term-run
    n_terms = starts.size

    # df: local run length, overridden for salted head terms (their postings
    # are split across S partitions, so local counts undercount df)
    df_per_run = counts.astype(np.int64).copy()
    if head_df:
        for i in range(n_terms):
            g = head_df.get(vocab[run_codes[i]])
            if g is not None:
                df_per_run[i] = g
    df_per_row = np.repeat(df_per_run, counts)

    scores = bm25_scores(tf, imp, dl, df_per_row, num_docs, avgdl,
                         cfg.bm25_k1, cfg.bm25_b)

    # ---- encode streams (whole-partition vectorized) ----
    # delta resets at every BLOCK boundary (not just term starts): each
    # block's first doc_id is absolute, so any block decodes independently —
    # the prerequisite for block-level IO skipping (Ding & Suel 2011)
    B = cfg.posting_block_size
    within = np.arange(n, dtype=np.int64) - np.repeat(starts, counts)
    blk_start_mask = (within % B) == 0
    ids_delta = _delta_with_resets(doc_ids.astype(np.uint64), blk_start_mask)
    ids_bl = _varint_lengths(ids_delta)
    tf_u = tf.astype(np.uint64)
    tf_bl = _varint_lengths(tf_u)
    dl_u = dl.astype(np.uint64)
    dl_bl = _varint_lengths(dl_u)

    imp4 = imp * 4.0
    imp_exact = bool(np.all(imp4 == np.round(imp4)) and np.all(imp4 >= 0))
    if imp_exact:
        imp_u = np.round(imp4).astype(np.uint64)
        imp_bl = _varint_lengths(imp_u)
        imp_stream = encode_varints(imp_u)
    else:
        imp_bl = np.full(n, 4, dtype=np.int64)
        imp_stream = imp.astype(np.float32).tobytes()

    pos_col = tbl.column("positions").combine_chunks()
    flat_pos = pc.list_flatten(pos_col).to_numpy(zero_copy_only=False).astype(np.uint64)
    npos = pc.list_value_length(pos_col).to_numpy(zero_copy_only=False).astype(np.int64)
    npos_u = npos.astype(np.uint64)
    npos_bl = _varint_lengths(npos_u)
    pos_start = np.zeros(flat_pos.size, dtype=bool)
    if flat_pos.size:
        list_starts = np.cumsum(npos) - npos          # start offset of each list
        pos_start[list_starts[npos > 0]] = True
        pos_delta = _delta_with_resets(flat_pos, pos_start)
        pos_bl = _varint_lengths(pos_delta)
        pos_stream = encode_varints(pos_delta)
    else:
        pos_delta = flat_pos
        pos_bl = np.zeros(0, dtype=np.int64)
        pos_stream = b""

    ids_stream = encode_varints(ids_delta)
    tf_stream = encode_varints(tf_u)
    dl_stream = encode_varints(dl_u)
    npos_stream = encode_varints(npos_u)

    # ---- per-term offsets into each stream ----
    def run_offsets(bytelens: np.ndarray) -> tuple:
        cum = np.concatenate(([0], np.cumsum(bytelens)))
        offs = cum[starts]
        lens = cum[np.append(starts[1:], n)] - offs
        return offs, lens

    ids_off, ids_len = run_offsets(ids_bl)
    tf_off, tf_len = run_offsets(tf_bl)
    dl_off, dl_len = run_offsets(dl_bl)
    imp_off, imp_len = run_offsets(imp_bl)
    npos_off, npos_len = run_offsets(npos_bl)

    # pos stream boundaries live in flattened-position space
    pos_cum = np.concatenate(([0], np.cumsum(pos_bl)))
    list_cum = np.concatenate(([0], np.cumsum(npos)))    # posting -> flat idx
    term_pos_start = list_cum[starts]
    term_pos_end = list_cum[np.append(starts[1:], n)]
    pos_off = pos_cum[term_pos_start]
    pos_len = pos_cum[term_pos_end] - pos_off

    # ---- absolute section bases ----
    sections = {
        "ids": ids_stream, "tf": tf_stream, "dl": dl_stream,
        "imp": imp_stream, "npos": npos_stream, "pos": pos_stream,
    }
    bases = {}
    acc = 0
    for name in _STREAMS:
        bases[name] = acc
        acc += len(sections[name])

    # ---- block-max / skip metadata (Ding & Suel 2011) ----
    # per-term, per-block: last doc_id + max score (pruning bounds) AND the
    # block's byte offset into each stream (relative to the term's stream
    # start) — block-independent delta resets above make any block
    # decodable from just these offsets
    cum_ids = np.concatenate(([0], np.cumsum(ids_bl)))
    cum_tf = np.concatenate(([0], np.cumsum(tf_bl)))
    cum_dl = np.concatenate(([0], np.cumsum(dl_bl)))
    cum_imp = np.concatenate(([0], np.cumsum(imp_bl)))
    block_last, block_max = [], []
    ids_boff, tf_boff, dl_boff, imp_boff = [], [], [], []
    for i in range(n_terms):
        s, e = starts[i], starts[i] + counts[i]
        d = doc_ids[s:e]
        nb = (d.size + B - 1) // B
        lasts = d[np.minimum(np.arange(1, nb + 1) * B - 1, d.size - 1)]
        # block maxima taken in f64 then cast CONSERVATIVELY to f32: a
        # round-to-nearest cast can round DOWN, and a stored bound below the
        # true block max would let block-skipping prune a winning doc. Bump
        # any down-rounded value to the next f32 up (bound >= true max).
        maxs64 = np.maximum.reduceat(scores[s:e], np.arange(0, d.size, B))
        maxs = maxs64.astype(np.float32)
        low = maxs.astype(np.float64) < maxs64
        if low.any():
            maxs[low] = np.nextafter(maxs[low], np.float32(np.inf))
        block_last.append(lasts.astype(np.int64))
        block_max.append(maxs)
        rows = s + np.arange(0, d.size, B)
        ids_boff.append((cum_ids[rows] - cum_ids[s]).astype(np.int64))
        tf_boff.append((cum_tf[rows] - cum_tf[s]).astype(np.int64))
        dl_boff.append((cum_dl[rows] - cum_dl[s]).astype(np.int64))
        imp_boff.append((cum_imp[rows] - cum_imp[s]).astype(np.int64))

    order = np.argsort(np.array(vocab, dtype=object)[run_codes].astype(str), kind="stable")
    term_names = [vocab[run_codes[i]] for i in order]

    def col(vals, idx=order):
        return np.asarray(vals)[idx]

    term_tbl = pa.table({
        "term": pa.array(term_names, pa.string()),
        "df": pa.array(col(df_per_run), pa.int64()),
        "n": pa.array(col(counts), pa.int32()),
        "ids_off": pa.array(col(ids_off + bases["ids"]), pa.int64()),
        "ids_len": pa.array(col(ids_len), pa.int32()),
        "tf_off": pa.array(col(tf_off + bases["tf"]), pa.int64()),
        "tf_len": pa.array(col(tf_len), pa.int32()),
        "dl_off": pa.array(col(dl_off + bases["dl"]), pa.int64()),
        "dl_len": pa.array(col(dl_len), pa.int32()),
        "imp_off": pa.array(col(imp_off + bases["imp"]), pa.int64()),
        "imp_len": pa.array(col(imp_len), pa.int32()),
        "npos_off": pa.array(col(npos_off + bases["npos"]), pa.int64()),
        "npos_len": pa.array(col(npos_len), pa.int32()),
        "pos_off": pa.array(col(pos_off + bases["pos"]), pa.int64()),
        "pos_len": pa.array(col(pos_len), pa.int32()),
        "block_last": pa.array([block_last[i].tolist() for i in order], pa.list_(pa.int64())),
        "block_max": pa.array([block_max[i].tolist() for i in order], pa.list_(pa.float32())),
        "ids_boff": pa.array([ids_boff[i].tolist() for i in order], pa.list_(pa.int64())),
        "tf_boff": pa.array([tf_boff[i].tolist() for i in order], pa.list_(pa.int64())),
        "dl_boff": pa.array([dl_boff[i].tolist() for i in order], pa.list_(pa.int64())),
        "imp_boff": pa.array([imp_boff[i].tolist() for i in order], pa.list_(pa.int64())),
    })

    # atomic writes: temp name then rename (idempotent under task retry)
    tmp = base + ".seg.tmp"
    with open(tmp, "wb") as f:
        for name in _STREAMS:
            f.write(sections[name])
    os.replace(tmp, base + ".seg")
    pq.write_table(term_tbl, base + ".terms.parquet.tmp")
    os.replace(base + ".terms.parquet.tmp", base + ".terms.parquet")

    row = _manifest_row(part_id, n_terms, int(n), acc, input_fingerprint, t0,
                        imp_exact=imp_exact, block_size=B)
    _write_done(base, row)
    return row


def _empty_terms_table() -> pa.Table:
    return pa.table({
        "term": pa.array([], pa.string()), "df": pa.array([], pa.int64()),
        "n": pa.array([], pa.int32()),
        **{f"{s}_off": pa.array([], pa.int64()) for s in _STREAMS},
        **{f"{s}_len": pa.array([], pa.int32()) for s in _STREAMS},
        "block_last": pa.array([], pa.list_(pa.int64())),
        "block_max": pa.array([], pa.list_(pa.float32())),
        **{f"{s}_boff": pa.array([], pa.list_(pa.int64()))
           for s in ("ids", "tf", "dl", "imp")},
    }).select(["term", "df", "n",
               "ids_off", "ids_len", "tf_off", "tf_len", "dl_off", "dl_len",
               "imp_off", "imp_len", "npos_off", "npos_len", "pos_off", "pos_len",
               "block_last", "block_max",
               "ids_boff", "tf_boff", "dl_boff", "imp_boff"])


def _manifest_row(part_id, n_terms, n_postings, n_bytes, fingerprint, t0,
                  imp_exact=True, block_size=0):
    return {
        "part": int(part_id), "num_terms": int(n_terms),
        "num_postings": int(n_postings), "seg_bytes": int(n_bytes),
        "imp_varint": bool(imp_exact), "input_fingerprint": fingerprint,
        "block_size": int(block_size),
        "build_secs": round(time.time() - t0, 4), "status": "complete",
    }


def _ids_from_block_deltas(d: np.ndarray, block_size: int) -> np.ndarray:
    """Reconstruct doc_ids from per-block-reset deltas (first value of every
    block is absolute), vectorized: global cumsum minus a per-block base."""
    if d.size == 0:
        return d.astype(np.int64)
    cs = np.cumsum(d, dtype=np.uint64)
    bs = np.arange(0, d.size, block_size)
    adj = cs[bs] - d[bs]
    sizes = np.diff(np.append(bs, d.size))
    return (cs - np.repeat(adj, sizes)).astype(np.int64)


def _write_done(base: str, row: dict):
    with open(base + ".done.json.tmp", "w") as f:
        json.dump(row, f)
    os.replace(base + ".done.json.tmp", base + ".done.json")


class SegmentReader:
    """Query-side reader for one partition (SURVEY.md §2 S11).

    Term dictionary loads once (sorted; binary-search lookup); posting streams
    are read as byte slices per term and decoded with the vectorized varint
    codec. An LRU-ish cache bounds repeated decodes (reference search.py:53-61
    caches the same way).
    """

    def __init__(self, base: str, max_cache: int = 1000):
        self.base = base
        self._tbl = pq.read_table(base + ".terms.parquet")
        self._terms = self._tbl.column("term").to_pylist()
        self._cols = {name: self._tbl.column(name).to_numpy(zero_copy_only=False)
                      for name in ("df", "n", "ids_off", "ids_len", "tf_off", "tf_len",
                                    "dl_off", "dl_len", "imp_off", "imp_len",
                                    "npos_off", "npos_len", "pos_off", "pos_len")}
        self._block_last = self._tbl.column("block_last").to_pylist()
        self._block_max = self._tbl.column("block_max").to_pylist()
        names = self._tbl.schema.names
        self._boffs = ({s: self._tbl.column(f"{s}_boff").to_pylist()
                        for s in ("ids", "tf", "dl", "imp")}
                       if "ids_boff" in names else None)
        with open(base + ".done.json") as f:
            self.meta = json.load(f)
        self.block_size = int(self.meta.get("block_size", 0))
        self._fh = None
        self._cache: Dict[str, TermPostings] = {}
        self._max_cache = max_cache
        # IO-skipping observability: block decodes vs whole-term decodes
        self.stats = {"blocks_decoded": 0, "full_decodes": 0}

    def _file(self):
        if self._fh is None:
            self._fh = open(self.base + ".seg", "rb")
        return self._fh

    def _read(self, off: int, length: int) -> bytes:
        f = self._file()
        f.seek(int(off))
        return f.read(int(length))

    def _find(self, term: str) -> int:
        import bisect
        i = bisect.bisect_left(self._terms, term)
        if i < len(self._terms) and self._terms[i] == term:
            return i
        return -1

    def postings(self, term: str, with_positions: bool = False) -> Optional[TermPostings]:
        hit = self._cache.get(term)
        if hit is not None and (not with_positions or hit.positions is not None):
            return hit
        i = self._find(term)
        if i < 0:
            return None
        self.stats["full_decodes"] += 1
        c = self._cols
        cnt = int(c["n"][i])
        d = decode_varints(self._read(c["ids_off"][i], c["ids_len"][i]), cnt)
        if self.block_size:
            ids = _ids_from_block_deltas(d, self.block_size)
        else:                         # pre-block-reset (v1) segment layout
            ids = np.cumsum(d, dtype=np.uint64).astype(np.int64)
        tf = decode_varints(self._read(c["tf_off"][i], c["tf_len"][i]), cnt).astype(np.int64)
        dl = decode_varints(self._read(c["dl_off"][i], c["dl_len"][i]), cnt).astype(np.int64)
        if self.meta.get("imp_varint", True):
            imp = decode_varints(self._read(c["imp_off"][i], c["imp_len"][i]), cnt).astype(np.float64) / 4.0
        else:
            imp = np.frombuffer(self._read(c["imp_off"][i], c["imp_len"][i]), dtype=np.float32).astype(np.float64)
        positions = None
        if with_positions:
            npos = decode_varints(self._read(c["npos_off"][i], c["npos_len"][i]), cnt).astype(np.int64)
            flat = decode_varints(self._read(c["pos_off"][i], c["pos_len"][i]), int(npos.sum()))
            positions = []
            start = 0
            for k in npos:
                seg = np.cumsum(flat[start:start + int(k)], dtype=np.uint64).astype(np.int64)
                positions.append(seg)
                start += int(k)
        tp = TermPostings(
            term=term, df=int(c["df"][i]), doc_ids=ids, tf=tf, doclen=dl,
            importance=imp, positions=positions,
            block_last=np.asarray(self._block_last[i], dtype=np.int64),
            block_max=np.asarray(self._block_max[i], dtype=np.float32),
        )
        if len(self._cache) >= self._max_cache:
            self._cache.pop(next(iter(self._cache)))
        self._cache[term] = tp
        return tp

    # ---- block-level access (IO skipping; needs the v2 layout) ----

    def term_handle(self, term: str):
        """(index, df, n, block_last, block_max) WITHOUT decoding postings —
        the metadata a lazy block-skipping cursor needs. None if the term is
        absent or the segment predates the blocked layout."""
        if self._boffs is None or not self.block_size:
            return None
        i = self._find(term)
        if i < 0:
            return None
        return (i, int(self._cols["df"][i]), int(self._cols["n"][i]),
                np.asarray(self._block_last[i], dtype=np.int64),
                np.asarray(self._block_max[i], dtype=np.float32))

    def decode_block(self, term_idx: int, blk: int):
        """Decode ONE block of a term: (doc_ids, tf, doclen, importance).

        Reads only that block's byte ranges of each stream (per-block delta
        resets make the ids self-contained)."""
        c = self._cols
        i = term_idx
        cnt = int(c["n"][i])
        B = self.block_size
        nb = (cnt + B - 1) // B
        if not (0 <= blk < nb):
            raise IndexError(blk)
        bcnt = min(B, cnt - blk * B)
        bo = self._boffs
        self.stats["blocks_decoded"] += 1

        def rng(stream, stream_total_len):
            offs = bo[stream][i]
            start = int(offs[blk])
            end = int(offs[blk + 1]) if blk + 1 < len(offs) else int(stream_total_len)
            return start, end - start

        s, ln = rng("ids", c["ids_len"][i])
        d = decode_varints(self._read(int(c["ids_off"][i]) + s, ln), bcnt)
        ids = np.cumsum(d, dtype=np.uint64).astype(np.int64)   # block-local
        s, ln = rng("tf", c["tf_len"][i])
        tf = decode_varints(self._read(int(c["tf_off"][i]) + s, ln), bcnt).astype(np.int64)
        s, ln = rng("dl", c["dl_len"][i])
        dl = decode_varints(self._read(int(c["dl_off"][i]) + s, ln), bcnt).astype(np.int64)
        s, ln = rng("imp", c["imp_len"][i])
        raw = self._read(int(c["imp_off"][i]) + s, ln)
        if self.meta.get("imp_varint", True):
            imp = decode_varints(raw, bcnt).astype(np.float64) / 4.0
        else:
            imp = np.frombuffer(raw, dtype=np.float32).astype(np.float64)
        return ids, tf, dl, imp

    def df(self, term: str) -> int:
        """Document frequency from the term dictionary alone (no decode)."""
        i = self._find(term)
        return int(self._cols["df"][i]) if i >= 0 else 0

    def terms(self):
        return list(self._terms)

    def close(self):
        if self._fh:
            self._fh.close()
            self._fh = None
