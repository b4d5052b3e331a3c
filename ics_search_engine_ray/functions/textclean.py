"""Text cleaning with reference-parity semantics.

Mirrors ``DocumentProcessor._clean_text`` (reference:
components/document_processor.py:31-36) exactly, in the same order:

1. remove chars in [\\u0080-\\uffff] (note: astral-plane chars > U+FFFF are
   *kept* by that regex — we replicate that),
2. hyphens -> spaces,
3. collapse whitespace runs to a single space,
4. strip.
"""

from __future__ import annotations

import re

_RE_NONASCII = re.compile("[\\u0080-\\uffff]")
_RE_HYPHEN = re.compile(r"[\-]")
_RE_WS = re.compile(r"\s+")


def clean_text(text: str) -> str:
    text = _RE_NONASCII.sub("", text)
    text = _RE_HYPHEN.sub(" ", text)
    text = _RE_WS.sub(" ", text)
    return text.strip()
