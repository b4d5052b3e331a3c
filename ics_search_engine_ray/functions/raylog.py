"""Suppress Ray Data's spurious empty-schema divergence warning.

Root cause (Ray 2.49.2, traced for round 5): the sort-based shuffle that
backs ``Dataset.sort``, ``groupby().aggregate()`` and
``groupby().map_groups()`` manufactures SCHEMA-LESS empty blocks inside
Ray itself, no matter how carefully user code types its empty batches:

- ``ArrowBlockAccessor.sort`` returns ``pyarrow_table_from_pydict({})``
  for any 0-row input block
  (``ray/data/_internal/arrow_block.py:381``), and
- ``sort_and_partition`` emits one such schema-less table PER output
  partition for an empty map-side block (``arrow_block.py:394``), and
- ``merge_sorted_blocks`` returns one for any reduce partition whose
  assigned key range holds no rows (``arrow_block.py:409``) — routine
  whenever #partitions > #distinct group keys, i.e. for every bucketed
  groupby at small scale.

The streaming executor then logs "Operator produced a RefBundle with a
different schema than the previous one. Previous schema: ... new
schema: ." once per operator
(``streaming_executor_state.py:793``) and immediately SELF-HEALS by
re-labelling the empty bundle with the previous typed schema
(``dedupe_schemas_with_validation`` re-wraps the bundle), so the warning
carries no signal when the "new schema" is the empty one. Every
user-code empty batch in this repo is explicitly typed (CLAUDE.md hard
rule; audited in round 4) — the residual warnings are 100% this Ray
code path.

We verified no user-side plan arrangement eliminates it: typed empties,
generator UDFs that skip empties, pre-groupby repartitioning, and
``enforce_schemas=True`` all still warn (the warning precedes the
enforcement), and the hash-shuffle strategy both still warns and is
unusable here (see package ``__init__`` note). So the correct fix is a
*surgical* logging filter: drop ONLY the record whose "new schema" is
empty; a typed->typed divergence (a real pipeline bug) still warns.

Second suppressed warning (also traced): "Failed to hash the schemas
(for deduplication): unhashable type: 'dict'" from
``ray/data/_internal/arrow_ops/transform_pyarrow.py:181``
(unify_schemas' ``set(schemas)`` early-exit). Root cause is a pyarrow
wart: ``hash(schema)`` RAISES TypeError when the schema carries
schema-level metadata (``pa.schema(...).with_metadata({b'k': b'v'})``
is unhashable while field-level metadata hashes fine), and every
parquet file written via pandas embeds the ``b'pandas'`` schema
metadata — so any multi-block concat of parquet-sourced blocks hits
it. Ray catches the TypeError and falls back to the full unify (the
CORRECT result, just without the early exit), so the warning is pure
noise for metadata-bearing schemas; we drop exactly the
``unhashable type: 'dict'`` variant and keep any other hash failure.
"""

from __future__ import annotations

import logging

# The executor module that emits the warning (logger name == __name__
# there). Filters must sit on the EMITTING logger: logging applies
# ancestor handlers but only the source logger's filters.
_EXECUTOR_LOGGER = "ray.data._internal.execution.streaming_executor_state"

_PREFIX = "Operator produced a RefBundle with a different schema"
# Empty pyarrow schemas render as "" in the f-string, so the benign
# variant (and only it) ends exactly like this:
_EMPTY_NEW = "new schema: . This may lead to unexpected behavior."


class _EmptySchemaDivergenceFilter(logging.Filter):
    """Drops the empty-new-schema divergence warning; keeps real ones."""

    def filter(self, record: logging.LogRecord) -> bool:  # True = keep
        try:
            msg = record.getMessage()
        except Exception:
            return True
        if not msg.startswith(_PREFIX):
            return True
        return not msg.rstrip().endswith(_EMPTY_NEW)


_TRANSFORM_LOGGER = "ray.data._internal.arrow_ops.transform_pyarrow"
_HASH_PREFIX = "Failed to hash the schemas (for deduplication): "
_HASH_BENIGN = _HASH_PREFIX + "unhashable type: 'dict'"


class _SchemaHashDictFilter(logging.Filter):
    """Drops unify_schemas' dedup-hash warning ONLY for the pyarrow
    metadata-unhashability case (see module docstring); other hash
    failures still warn."""

    def filter(self, record: logging.LogRecord) -> bool:  # True = keep
        try:
            msg = record.getMessage()
        except Exception:
            return True
        if not msg.startswith(_HASH_PREFIX):
            return True
        return msg.rstrip() != _HASH_BENIGN


def install_empty_schema_filter() -> None:
    """Idempotently install both filters on the emitting loggers."""
    lg = logging.getLogger(_EXECUTOR_LOGGER)
    if not any(isinstance(f, _EmptySchemaDivergenceFilter)
               for f in lg.filters):
        lg.addFilter(_EmptySchemaDivergenceFilter())
    lg2 = logging.getLogger(_TRANSFORM_LOGGER)
    if not any(isinstance(f, _SchemaHashDictFilter) for f in lg2.filters):
        lg2.addFilter(_SchemaHashDictFilter())
