"""Typed engine configuration.

Replaces the reference's module-level CONFIG / TAG_WEIGHTS / STOP_WORDS
(reference: utils/constants.py:27-53) with a single dataclass that covers tag
weights, stopwords, BM25 parameters, dedup thresholds, and the physical knobs
(partition counts, salting, posting-block size) the Ray Data pipeline needs.
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace
from typing import Dict, FrozenSet, Tuple

# The standard 174-word English stopword list used by the reference
# (reference: utils/constants.py:2-19; it is the public ranks.nl list plus
# 'com'). Queries drop stopwords; the index keeps them (tokenizer.py:28-31).
STOP_WORDS: FrozenSet[str] = frozenset({
    'a', 'about', 'above', 'after', 'again', 'against', 'all', 'am', 'an',
    'and', 'any', 'are', "aren't", 'as', 'at', 'be', 'because', 'been',
    'before', 'being', 'below', 'between', 'both', 'but', 'by', 'can',
    "can't", 'cannot', 'com', 'could', "couldn't", 'did', "didn't", 'do',
    'does', "doesn't", 'doing', "don't", 'down', 'during', 'each', 'else',
    'ever', 'few', 'for', 'from', 'further', 'get', 'had', "hadn't", 'has',
    "hasn't", 'have', "haven't", 'having', 'he', 'her', 'here', "here's",
    'hers', 'herself', 'him', 'himself', 'his', 'how', "how's", 'i', "i'm",
    'if', 'in', 'into', 'is', "isn't", 'it', "it's", 'its', 'itself',
    "let's", 'me', 'more', 'most', "mustn't", 'my', 'myself', 'no', 'nor',
    'not', 'of', 'off', 'on', 'once', 'only', 'or', 'other', 'ought', 'our',
    'ours', 'ourselves', 'out', 'over', 'own', 'same', "shan't", 'she',
    "she'd", "she'll", "she's", 'should', "shouldn't", 'so', 'some', 'such',
    'than', 'that', "that's", 'the', 'their', 'theirs', 'them', 'themselves',
    'then', 'there', "there's", 'these', 'they', "they'd", "they'll",
    "they're", "they've", 'this', 'those', 'through', 'to', 'too', 'under',
    'until', 'up', 'very', 'was', "wasn't", 'we', "we'd", "we'll", "we're",
    "we've", 'were', "weren't", 'what', "what's", 'when', "when's", 'where',
    "where's", 'which', 'while', 'who', "who's", 'whom', 'why', "why's",
    'with', "won't", 'would', "wouldn't", 'you', "you'd", "you'll", "you're",
    "you've", 'your', 'yours', 'yourself', 'yourselves',
})

# Tag importance weights (reference: utils/constants.py:46-53).
TAG_WEIGHTS: Dict[str, float] = {
    'title': 2.0,
    'h1': 1.5,
    'h2': 1.0,
    'h3': 0.75,
    'b': 0.5,
    'strong': 0.5,
}


@dataclass(frozen=True)
class EngineConfig:
    # --- semantics (reference parity) ---
    tag_weights: Tuple[Tuple[str, float], ...] = tuple(TAG_WEIGHTS.items())
    similarity_threshold: float = 0.85      # constants.py:28
    simhash_bits: int = 128                 # utils/simhash.py:9
    simhash_bands: int = 20                 # LSH bands for near-dup candidate
    # generation. bands >= max_hamming+1 -> exact-match banding (radius 0);
    # bands in [ceil((max_hamming+1)/2), max_hamming] -> wider bands with
    # 1-bit flip-down probing (stages/dedup.py BandEmitter). Both are EXACT
    # (pigeonhole) and produce identical results (tested). Trade-off: 20
    # narrow bands shuffle 20 rows/doc but verify ~8x more candidate pairs;
    # 10 wide bands shuffle ~75 rows/doc with ~8x fewer pair checks and much
    # flatter bucket skew (4% vs 23% max bucket) — prefer 10 when verify
    # compute, not shuffle bandwidth, is the cluster's scarce resource.
    stem: bool = True                       # Porter stemming on index+query

    # --- BM25 (north-star scorer; Robertson & Zaragoza 2009) ---
    bm25_k1: float = 1.2
    bm25_b: float = 0.75

    # --- physical execution ---
    docid_mode: str = "hash"                # "hash": doc_id = md5(url)
    # 63-bit hash (coordination-free; default). "dense": doc_id = global
    # sorted-url rank (stages/docid.py) — posting doc-id gaps shrink from
    # ~2^63/N to ~P (delta+varint bytes drop sharply), at the cost of one
    # extra range-partition shuffle of the tokenized relation at build
    # time. Query results are rank- and score-identical (tested).
    num_index_partitions: int = 16          # term-hash shuffle width (P)
    head_term_salt: int = 4                 # S: doc-hash buckets per head term
    dynamic_salt_df_frac: float = 0.10      # ALSO salt any term whose df
    # exceeds this fraction of the corpus (sampled pre-pass in build step 6;
    # the static stemmed-stopword set alone misses corpus-specific hot terms
    # — reference todo.md:44-50 pathology generalized). 0 disables.
    posting_block_size: int = 128           # postings per skip/block-max block
    tokenize_concurrency: Tuple[int, int] = (2, 64)  # actor pool min/max;
    # autoscaling pool — max sized for a multi-node cluster, the scheduler
    # never exceeds available CPUs on a small one
    tokenize_batch_size: int = 256
    extract_batch_size: int = 256

    @property
    def tag_weight_map(self) -> Dict[str, float]:
        return dict(self.tag_weights)

    @property
    def max_hamming(self) -> int:
        """similarity >= threshold  <=>  hamming <= floor(b * (1 - thr))."""
        return int(self.simhash_bits * (1.0 - self.similarity_threshold) + 1e-9)

    def with_(self, **kw) -> "EngineConfig":
        return replace(self, **kw)


DEFAULT_CONFIG = EngineConfig()

# Head terms for salted partitioning: stopwords are kept in the index
# (reference tokenizer.py:28-31), so the Porter-stemmed stopword set is the
# statically known head of the df distribution. A df pre-pass can extend this
# set dynamically; the static set covers the pathological case the reference
# documented (todo.md:44-50, the 7.7-9.8 s stopword-stuffed queries).
def head_terms(cfg: EngineConfig = DEFAULT_CONFIG) -> FrozenSet[str]:
    from .functions.tokenizer import tokenize_text
    out = set()
    for w in STOP_WORDS:
        for t in tokenize_text(w, stem=cfg.stem):
            out.add(t)
    return frozenset(out)
