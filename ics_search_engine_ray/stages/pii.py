"""PII detection and redaction over a document/text table.

A standard pre-training curation stage (e.g. the email/IP/phone scrub in
BigScience ROOTS, Laurencon et al. 2022, and the C4 blocklist family):
find personally-identifiable substrings and replace them with typed
placeholder tokens, emitting per-document hit counts so downstream
policy (drop vs scrub vs keep) can be decided from the counts alone.

Everything here is a PURE MAP over batches — no shuffle, no state, no
driver materialization — so at 100 TB it is embarrassingly parallel and
streams block-by-block. The regex kernels are Arrow's
``replace_substring_regex`` / ``count_substring_regex`` (RE2, executed in
C++ over the whole column — zero Python-per-row). DuckDB's
``regexp_replace(..., 'g')`` is RE2 as well, so the SQL oracle replays
the exact same automaton and the comparison is bit-identical by
construction.

Reference scope: the reference engine has no PII stage (its corpus is
crawled course pages); this extends the curation surface the task brief
asks for.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import pyarrow as pa
import pyarrow.compute as pc

# Ordered: earlier patterns are replaced first, and later patterns run
# over the already-scrubbed text (an email's digits are gone before the
# phone pattern looks, an IP is consumed before bare digit runs).
# Kept deliberately RE2-simple (no backrefs / lookaround — neither RE2
# nor the SQL replica supports them) and anchored on separators rather
# than \b so Arrow and DuckDB agree on every boundary.
PII_PATTERNS: List[Tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}",
     "<EMAIL>"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\b\d{3}[-. ]\d{3}[-. ]\d{4}\b", "<PHONE>"),
    ("card", r"\b\d{4}[- ]?\d{4}[- ]?\d{4}[- ]?\d{4}\b", "<CARD>"),
]


def pii_sql_exprs(text_expr: str) -> Tuple[str, Dict[str, str]]:
    """The DuckDB replica of :func:`pii_scrub`'s kernel: returns
    (scrub_expression, {kind: count_expression}) over ``text_expr``.
    Counts are measured on the same intermediate text the scrub chain
    sees (pattern i counts AFTER patterns < i were replaced), exactly
    like the batch kernel below."""
    counts: Dict[str, str] = {}
    cur = text_expr
    for kind, pat, rep in PII_PATTERNS:
        p = pat.replace("'", "''")
        counts[kind] = (
            f"length(regexp_replace({cur}, '{p}', '\x01', 'g'))"
            f" - length(regexp_replace({cur}, '{p}', '', 'g'))")
        cur = f"regexp_replace({cur}, '{p}', '{rep}', 'g')"
    return cur, counts


def pii_scrub(docs, text_col: str = "text", id_col: str = "doc_id"):
    """Scrub PII -> (doc_id, clean_text, n_email, n_ip, n_phone, n_card).

    One chained RE2 pass per pattern, all inside Arrow C++ (the count is
    a ``count_substring_regex`` over the text the pattern actually ran
    on, so counts match replacements even when an earlier placeholder
    changes later boundaries). O(bytes) per batch, nothing ships but the
    output column."""

    def scrub(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table(
                {id_col: pa.array([], pa.int64()),
                 "clean_text": pa.array([], pa.string()),
                 **{f"n_{k}": pa.array([], pa.int64())
                    for k, _, _ in PII_PATTERNS}})
        cur = pc.cast(b.column(text_col), pa.string())
        out: Dict[str, pa.Array] = {id_col: b.column(id_col)}
        for kind, pat, rep in PII_PATTERNS:
            out[f"n_{kind}"] = pc.cast(
                pc.count_substring_regex(cur, pattern=pat), pa.int64())
            cur = pc.replace_substring_regex(
                cur, pattern=pat, replacement=rep)
        out["clean_text"] = cur
        return pa.table({id_col: out[id_col], "clean_text": out["clean_text"],
                         **{f"n_{k}": out[f"n_{k}"]
                            for k, _, _ in PII_PATTERNS}})

    return docs.select_columns([id_col, text_col]) \
        .map_batches(scrub, batch_format="pyarrow")


def blocklist_filter(docs, blocklist: List[str], text_col: str = "text",
                     id_col: str = "doc_id", max_frac: float = 0.0):
    """LDNOOBW / C4-style bad-word document filter: count how many
    tokens of each document are on ``blocklist`` and keep the document
    iff the blocked fraction is <= ``max_frac`` (C4's rule is any-hit
    drops, i.e. the default 0.0). Emits the counts alongside the verdict
    so downstream policy can re-threshold without re-scanning.

    Pure map — no shuffle, no state. Tokenization is the engine's
    standard [a-z0-9]+ len>1 rule; membership is one vectorized
    ``np.isin`` over the batch's flattened token array against the
    sorted blocklist (blocklists are ~2k words, bound in the task
    closure — small enough to ship with the function, the documented
    exception to the broadcast gate).

    Output: id, n_tokens, n_blocked, blocked_frac
    (= n_blocked/n_tokens as one IEEE division, 0.0 for empty docs),
    keep (bool).
    """
    import numpy as np

    from ..functions.tokenizer import TOKEN_RE

    block = np.array(sorted({w.lower() for w in blocklist}), dtype=object)
    mf = float(max_frac)

    def fn(b: pa.Table) -> pa.Table:
        empty = pa.table({id_col: pa.array([], pa.int64()),
                          "n_tokens": pa.array([], pa.int64()),
                          "n_blocked": pa.array([], pa.int64()),
                          "blocked_frac": pa.array([], pa.float64()),
                          "keep": pa.array([], pa.bool_())})
        if b.num_rows == 0:
            return empty
        toks = [[t for t in TOKEN_RE.findall((x or "").lower())
                 if len(t) > 1] for x in b.column(text_col).to_pylist()]
        n_tok = np.array([len(t) for t in toks], np.int64)
        flat = np.array([t for ts in toks for t in ts], dtype=object)
        if flat.size:
            hit = np.isin(flat, block)
            bounds = np.concatenate(([0], np.cumsum(n_tok)))
            n_blk = np.add.reduceat(
                np.concatenate((hit.astype(np.int64), [0])),
                bounds[:-1]) * (n_tok > 0)
        else:
            n_blk = np.zeros_like(n_tok)
        frac = np.where(n_tok > 0,
                        n_blk.astype(np.float64)
                        / np.maximum(n_tok, 1).astype(np.float64), 0.0)
        return pa.table({
            id_col: b.column(id_col).cast(pa.int64()),
            "n_tokens": pa.array(n_tok, pa.int64()),
            "n_blocked": pa.array(n_blk, pa.int64()),
            "blocked_frac": pa.array(frac, pa.float64()),
            "keep": pa.array(frac <= mf)})

    return docs.map_batches(fn, batch_format="pyarrow")
