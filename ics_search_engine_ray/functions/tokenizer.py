"""Tokenization with reference-parity semantics.

Mirrors the reference tokenizer (reference: utils/tokenizer.py:9-34):
1. lowercase, 2. split on ``[a-zA-Z0-9]+``, 3. for queries only: drop
stopwords (pre-stemming), 4. Porter-stem every token, 5. drop tokens whose
*stemmed* length is 1. Stopwords are KEPT for indexing — only queries remove
them (tokenizer.py:28-31), which is what creates head-term skew in postings.

Unlike the reference (which re-creates the stemmer and regex on every call,
tokenizer.py:21-24), callers here hold a ``Tokenizer`` instance per Ray actor
with a persistent stem cache.
"""

from __future__ import annotations

import re
from typing import Dict, List, Optional

from ..config import STOP_WORDS
from .porter import porter_stem

TOKEN_RE = re.compile(r"[a-zA-Z0-9]+")


class Tokenizer:
    """Stateful tokenizer: compiled regex + per-instance stem cache.

    Construct once per Ray actor (in ``__init__`` of a map_batches class),
    reuse across batches.
    """

    def __init__(self, stem: bool = True, max_cache: int = 1_000_000):
        self.stem = stem
        self._cache: Dict[str, str] = {}
        self._max_cache = max_cache

    def _stem(self, tok: str) -> str:
        s = self._cache.get(tok)
        if s is None:
            s = porter_stem(tok)
            if len(self._cache) < self._max_cache:
                self._cache[tok] = s
            return s
        return s

    def tokens(self, text: str, for_query: bool = False) -> List[str]:
        raw = TOKEN_RE.findall(text.lower())
        if for_query:
            raw = [t for t in raw if t not in STOP_WORDS]
        if self.stem:
            stemmer = self._stem
            out = [stemmer(t) for t in raw]
        else:
            out = raw
        return [t for t in out if len(t) != 1]


_DEFAULT = Tokenizer(stem=True)
_NOSTEM = Tokenizer(stem=False)


def tokenize_text(text: str, for_query: bool = False, stem: bool = True) -> List[str]:
    """Module-level convenience mirroring reference ``tokenize(text, for_query)``."""
    tk = _DEFAULT if stem else _NOSTEM
    return tk.tokens(text, for_query=for_query)
