"""Explode tokenized docs into the ``doc_terms`` relation — fully vectorized.

``doc_terms(doc_id, term, tf, importance, positions, doclen)`` is the input
to the index-build shuffle (SURVEY.md §1.4). ``doclen`` (= token_count) is
carried through here on purpose: BM25/tf-idf normalization then never needs a
doc_id join against docmeta (SURVEY.md §2.4 J1 "preferred: zero join").

The explode uses Arrow list kernels (``list_flatten`` +
``list_parent_indices``) — no Python per-row loop.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

DOC_TERMS_SCHEMA = pa.schema([
    pa.field("doc_id", pa.int64()),
    pa.field("term", pa.string()),
    pa.field("tf", pa.int32()),
    pa.field("importance", pa.float32()),
    pa.field("positions", pa.list_(pa.int32())),
    pa.field("doclen", pa.int32()),
])


def explode_doc_terms(batch: pa.Table) -> pa.Table:
    terms_col = batch.column("terms").combine_chunks() if isinstance(batch.column("terms"), pa.ChunkedArray) else batch.column("terms")
    parents = pc.list_parent_indices(terms_col)
    return pa.Table.from_arrays(
        [
            pc.take(batch.column("doc_id"), parents),
            pc.list_flatten(batch.column("terms")),
            pc.list_flatten(batch.column("tfs")),
            pc.list_flatten(batch.column("imps")),
            pc.list_flatten(batch.column("poss")),
            pc.take(batch.column("token_count"), parents),
        ],
        schema=DOC_TERMS_SCHEMA,
    )


def doc_terms_dataset(tokenized):
    return tokenized.map_batches(explode_doc_terms, batch_format="pyarrow")
