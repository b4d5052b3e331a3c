"""Distributed fuzzy string self-join: all distinct-value pairs within
edit distance 1, via the SymSpell deletion-neighborhood trick (public:
Garbe's SymSpell; same family as Ukkonen's neighborhood generation).

Two strings are within one edit iff they share a member of each other's
{identity + single-deletion} variant sets (shared variant => distance
<= 2, so candidates are verified). That turns an O(N^2) all-pairs scan
into:

  1. per-batch distinct + variant emission — VECTORIZED: one
     ``utf8_slice + concat`` Arrow kernel pair per delete position
     (loop over max string length, never over rows),
  2. one groupby shuffle on the variant string (rows per name = len+1),
  3. within-group pair emission + a pair-keyed dedup groupby,
  4. verification of the few candidates (per-candidate work, not
     per-corpus-row; candidate count ~= true pairs + bounded FPs).

Group-size note at scale: a variant key's fan-in is the number of
strings one delete away from a common form — bounded for natural id/name
distributions; a pathological hot variant can be salted and its pairs
chunk-joined exactly like dedup's hot SimHash bands (SCALE.md).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _ed_le1(a: str, b: str) -> bool:
    """True iff edit distance(a, b) == 1 (equal strings excluded)."""
    la, lb = len(a), len(b)
    if a == b or abs(la - lb) > 1:
        return False
    if la == lb:
        return sum(x != y for x, y in zip(a, b)) == 1
    if la > lb:
        a, b, la, lb = b, a, lb, la
    i = 0
    while i < la and a[i] == b[i]:
        i += 1
    return a[i:] == b[i + 1:]


def edit_distance_pairs(ds, col: str, num_groups: int = 64):
    """Dataset (a, b) of distinct ``col`` value pairs (a < b) with
    edit distance exactly 1. See module docstring for the plan."""

    def variants(b: pa.Table) -> pa.Table:
        arr = pc.unique(pc.cast(b.column(col), pa.string()).drop_null())
        if len(arr) == 0:
            return pa.table({"variant": pa.array([], pa.string()),
                             "name": pa.array([], pa.string())})
        lens = pc.utf8_length(arr).to_numpy(zero_copy_only=False)
        out_v, out_n = [arr], [arr]          # identity variant
        big = 1 << 30
        for i in range(int(lens.max())):     # loop over positions, not rows
            sub = arr.filter(pa.array(lens > i))
            if len(sub) == 0:
                continue
            head = pc.utf8_slice_codeunits(sub, 0, i)
            tail = pc.utf8_slice_codeunits(sub, i + 1, big)
            out_v.append(pc.binary_join_element_wise(head, tail, ""))
            out_n.append(sub)
        return pa.table({"variant": pa.concat_arrays(out_v),
                         "name": pa.concat_arrays(out_n)})

    def group_pairs(g: pa.Table) -> pa.Table:
        # names sharing one variant: emit ordered candidate pairs
        v = g.column("variant").to_numpy(zero_copy_only=False)
        n = g.column("name").to_numpy(zero_copy_only=False)
        order = np.lexsort((n, v))
        v, n = v[order], n[order]
        # in-bucket (variant, name) dedup
        keep = np.concatenate(
            ([True], (v[1:] != v[:-1]) | (n[1:] != n[:-1])))
        v, n = v[keep], n[keep]
        starts = np.flatnonzero(np.concatenate(([True], v[1:] != v[:-1])))
        ends = np.append(starts[1:], v.size)
        pa_, pb_ = [], []
        for s, e in zip(starts, ends):
            if e - s < 2:
                continue
            seg = n[s:e]                      # sorted, distinct
            ii = np.repeat(np.arange(seg.size), seg.size)
            jj = np.tile(np.arange(seg.size), seg.size)
            m = ii < jj
            pa_.append(seg[ii[m]])
            pb_.append(seg[jj[m]])
        if not pa_:
            return pa.table({"a": pa.array([], pa.string()),
                             "b": pa.array([], pa.string())})
        return pa.table({"a": pa.array(np.concatenate(pa_), pa.string()),
                         "b": pa.array(np.concatenate(pb_), pa.string())})

    def dedup_verify(g: pa.Table) -> pa.Table:
        a = g.column("a").to_numpy(zero_copy_only=False)
        b = g.column("b").to_numpy(zero_copy_only=False)
        order = np.lexsort((b, a))
        a, b = a[order], b[order]
        keep = np.concatenate(
            ([True], (a[1:] != a[:-1]) | (b[1:] != b[:-1])))
        a, b = a[keep], b[keep]
        ok = np.fromiter((_ed_le1(x, y) for x, y in zip(a, b)),
                         bool, count=a.size)
        return pa.table({"a": pa.array(a[ok], pa.string()),
                         "b": pa.array(b[ok], pa.string())})

    def bucket(colname):
        # vectorized polynomial string hash (functions/wordhash.py; keys
        # must not contain newlines — true for the delete-variant
        # domain). Empty-string variants (deleting a 1-char string) are
        # outside flat_word_hashes' domain: pin them to bucket 0 so the
        # "" key is batch-independent and its pairs still co-locate.
        from ..functions.wordhash import flat_word_hashes

        def fn(t: pa.Table) -> pa.Table:
            s = t.column(colname).to_pylist()
            g = np.zeros(len(s), np.int64)
            nonempty = [x for x in s if x]
            if nonempty:
                idx = np.fromiter((bool(x) for x in s), bool,
                                  count=len(s))
                g[idx] = (flat_word_hashes(nonempty)
                          % np.uint64(num_groups)).astype(np.int64)
            return t.append_column("gkey", pa.array(g, pa.int64()))
        return fn

    cand = ds.select_columns([col]) \
        .map_batches(variants, batch_format="pyarrow") \
        .map_batches(bucket("variant"), batch_format="pyarrow") \
        .groupby("gkey").map_groups(
            lambda t: group_pairs(t.drop(["gkey"])), batch_format="pyarrow")

    return cand.map_batches(bucket("a"), batch_format="pyarrow") \
        .groupby("gkey").map_groups(
            lambda t: dedup_verify(t.drop(["gkey"])),
            batch_format="pyarrow")
