"""Ray-Data-native search-engine / data-processing engine.

Shuffle strategy note: the engine keeps Ray Data's default sort-based
shuffle. The hash-shuffle strategy was measured (Ray 2.49) to be ~2.5x
faster on the single wide term-partition groupby, but its per-groupby
aggregator-actor startup is catastrophic for the pipeline's many small
groupbys (simhash collapse, band verify, head-term df): a full build went
66s -> 327s with it enabled process-wide. Revisit per-stage once Ray
supports per-dataset strategy overrides cleanly.
"""


from .functions.memtune import tune_malloc as _tune_malloc
from .functions.raylog import install_empty_schema_filter as _schema_filter

_tune_malloc()
_schema_filter()
