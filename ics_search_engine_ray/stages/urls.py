"""URL canonicalization and canonical-URL dedup.

The first collapse every web-crawl pipeline runs before any content
dedup: two fetches of the same resource differ only by case, fragment,
tracking parameters, or a trailing slash, and must map to one canonical
key. (The reference defrags at render time only — search.py's
urldefrag; this is the corpus-side generalization.)

Canonical form here (documented simplification: the whole URL is
lowercased, not just scheme+host — canonicalizing only the authority
needs a dynamic-offset splice that neither Arrow nor the SQL replica
expresses vectorized, and the corpora this engine targets use
case-insensitive paths):

1. lowercase,
2. strip the ``#fragment``,
3. drop ``utm_*`` tracking parameters (three-step global RE2 chain that
   keeps the remaining query string well-formed),
4. strip trailing slashes.

Every step is one Arrow RE2 kernel over the column (C++, zero
Python-per-row) and DuckDB's regexp_replace replays the identical
automaton, so the SQL oracle is bit-exact. Pure map, no shuffle.
"""

from __future__ import annotations

from typing import List, Tuple

import pyarrow as pa
import pyarrow.compute as pc

# (pattern, replacement), applied in order AFTER lowercasing
URL_CANON_RULES: List[Tuple[str, str]] = [
    (r"#.*$", ""),                   # fragment
    (r"&utm_[^&]*", ""),             # non-leading utm params
    (r"\?utm_[^&]*&", "?"),          # leading utm param with successors
    (r"\?utm_[^&]*$", ""),           # lone utm param
    (r"/+$", ""),                    # trailing slashes
]


def url_canon_sql(url_expr: str) -> str:
    """The DuckDB replica of :func:`canonicalize_urls`' kernel chain."""
    cur = f"lower({url_expr})"
    for pat, rep in URL_CANON_RULES:
        # DuckDB string literals keep backslashes verbatim, so the raw
        # RE2 patterns embed as-is (none contains a quote)
        cur = f"regexp_replace({cur}, '{pat}', '{rep}', 'g')"
    return cur


def canonicalize_urls(ds, url_col: str = "url", out_col: str = "canon_url"):
    """Append ``out_col`` = canonical form of ``url_col``. Pure map."""

    def canon(b: pa.Table) -> pa.Table:
        u = pc.utf8_lower(pc.cast(b.column(url_col), pa.string()))
        for pat, rep in URL_CANON_RULES:
            u = pc.replace_substring_regex(u, pattern=pat, replacement=rep)
        return b.append_column(out_col, u)

    return ds.map_batches(canon, batch_format="pyarrow")


def url_dedup(ds, url_col: str = "url", id_col: str = "doc_id"):
    """Canonical-URL dedup -> (canon_url, keep_id, n_dups): one surviving
    id per canonical URL (the smallest — deterministic keep-first) plus
    the collapse count. The exact_dedup shape: canonicalize per batch,
    then ONE native groupby over (canon_url) with Min/Count aggregates —
    only (canon, id) pairs shuffle, never the payload."""
    from ray.data.aggregate import Count, Min

    canon = canonicalize_urls(ds.select_columns([id_col, url_col]),
                              url_col=url_col)
    agg = canon.groupby("canon_url").aggregate(
        Min(id_col, alias_name="keep_id"),
        Count(alias_name="n_dups"))

    def finish(b: pa.Table) -> pa.Table:
        return pa.table({
            "canon_url": b.column("canon_url"),
            "keep_id": b.column("keep_id").cast(pa.int64()),
            "n_dups": b.column("n_dups").cast(pa.int64())})

    return agg.map_batches(finish, batch_format="pyarrow")
