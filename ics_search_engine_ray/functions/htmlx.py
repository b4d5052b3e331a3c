"""HTML text / important-tag / link extraction on the stdlib ``html.parser``.

Mirrors the reference's BeautifulSoup(html.parser) usage (reference:
components/document_processor.py:38-91) without depending on bs4 (not
available here). Parity is against bs4's *html.parser tree builder*
semantics specifically, which differ from lxml/html5lib:

- no implied end tags: ``<p>a<p>b</p>`` NESTS the second p inside the first
  (html.parser performs no HTML5 implicit closes), so ``find_all('p')``
  yields both and the outer's ``get_text()`` contains the inner's text;
- an end tag closes the nearest matching open element and implicitly closes
  everything opened after it (bs4 ``_popToTag``); unmatched end tags are
  ignored;
- void elements (br/img/meta/...) never stay open;
- ``soup.get_text()`` concatenates every text node with no separator:
  script/style contents and CDATA sections included, comments and doctype
  excluded, entity references decoded (html.parser ``convert_charrefs``);
- branch rule (document_processor.py:42-46): if the page is utf-8 and has
  ``<p>`` elements, text = ``' '.join(p.get_text().strip() for p in ps)``
  in document (start-tag) order, else the full-document text; both cleaned
  with :func:`clean_text`. ``input_hint`` pages have no ``encoding`` column,
  so "is utf-8" is defined as "the html bytes decode strictly as utf-8";
- important text (document_processor.py:50-59): for each tag in TAG_WEIGHTS,
  per-element ``get_text().strip()``; identical strings accumulate weight
  (nested important tags each collect their own subtree, as find_all does);
- links (document_processor.py:81-91): every ``<a href>`` starting with
  http:// or https:// and != the page url, deduplicated. The reference's
  ``list(set(...))`` order is hash-seed dependent; we sort for determinism
  (documented divergence — reference order was never stable).

These semantics are pinned by hand-authored goldens in
``tests/test_extract_goldens.py`` (independent of the corpus generator).
"""

from __future__ import annotations

from dataclasses import dataclass
from html.parser import HTMLParser
from typing import Dict, List, Optional, Tuple

from ..config import TAG_WEIGHTS
from .textclean import clean_text

# bs4 HTMLTreeBuilder.empty_element_tags (public source): HTML5 voids plus
# legacy empties — these become empty elements immediately, never stay open
_VOID_TAGS = frozenset({
    "area", "base", "br", "col", "embed", "hr", "img", "input", "keygen",
    "link", "menuitem", "meta", "param", "source", "track", "wbr",
    "basefont", "bgsound", "command", "frame", "image", "isindex", "nextid",
    "spacer",
})


@dataclass
class PageExtract:
    text: str                                  # cleaned extracted text (M2/M3)
    weighted_text: List[Tuple[str, float]]     # (distinct text, summed weight) (M4)
    links: List[str]                           # sorted unique external links (M5)
    title: str                                 # first <title> text (doc_titles)
    is_utf8: bool
    used_p_branch: bool


class _Collector(HTMLParser):
    """Streaming equivalent of the bs4 tree + the reference's three
    ``find_all`` passes, with a real open-element stack so end-tag recovery
    matches bs4's ``_popToTag`` (close nearest match, implicitly closing
    anything opened after it)."""

    def __init__(self, tag_weights: Dict[str, float]):
        super().__init__(convert_charrefs=True)
        self.tag_weights = tag_weights
        self.all_text: List[str] = []
        # each frame: [tag, buf-or-None, slot] — buf collects subtree text
        # for tracked elements (p / weighted tags / first title)
        self._stack: List[list] = []
        self._p_slots: List[Optional[str]] = []    # per-<p> text, start order
        self.weighted: Dict[str, float] = {}
        self.links: List[str] = []
        self._title: Optional[str] = None
        self._seen_title = False

    # ---- tree building ----

    def handle_starttag(self, tag, attrs):
        if tag == "a":
            for k, v in attrs:
                if k == "href" and v:
                    self.links.append(v)
                    break
        if tag in _VOID_TAGS:
            return                                  # empty element: never open
        slot = -1
        buf = None
        first_title = False
        if tag == "p":
            self._p_slots.append(None)
            slot = len(self._p_slots) - 1
            buf = []
        else:
            if tag in self.tag_weights or tag == "title":
                buf = []
            if tag == "title" and not self._seen_title:
                self._seen_title = True
                first_title = True      # soup.title = first in document order
        self._stack.append([tag, buf, slot, first_title])

    def _finalize(self, frame):
        tag, buf, slot, first_title = frame
        if buf is None:
            return
        text = "".join(buf)
        if tag == "p":
            self._p_slots[slot] = text
            return
        if tag in self.tag_weights:
            t = text.strip()
            if t:
                self.weighted[t] = self.weighted.get(t, 0.0) + self.tag_weights[tag]
        if first_title:
            self._title = text

    def handle_endtag(self, tag):
        if tag in _VOID_TAGS:
            return
        for i in range(len(self._stack) - 1, -1, -1):
            if self._stack[i][0] == tag:
                # pop i..top: nearest match closes, everything above closes
                # implicitly (bs4 _popToTag)
                while len(self._stack) > i:
                    self._finalize(self._stack.pop())
                return
        # unmatched end tag: ignored (bs4 drops it)

    def handle_data(self, data):
        if not data:
            return
        self.all_text.append(data)
        for frame in self._stack:
            if frame[1] is not None:
                frame[1].append(data)

    def unknown_decl(self, data):
        # <![CDATA[x]]> -> CData node; bs4 get_text() includes CData
        if data.startswith("CDATA["):
            self.handle_data(data[6:])

    # comments (handle_comment) and doctype (handle_decl) default to no-ops:
    # bs4 get_text() excludes Comment/Doctype nodes

    def close(self):
        super().close()
        # document end closes every still-open element
        while self._stack:
            self._finalize(self._stack.pop())

    @property
    def p_texts(self) -> List[str]:
        return [s for s in self._p_slots if s is not None]


def extract_page(html: bytes, url: str, tag_weights: Optional[Dict[str, float]] = None) -> PageExtract:
    """Extract text / weighted important text / links from one page."""
    tw = tag_weights if tag_weights is not None else TAG_WEIGHTS
    is_utf8 = True
    try:
        raw = html.decode("utf-8")
    except UnicodeDecodeError:
        is_utf8 = False
        raw = html.decode("latin-1")

    c = _Collector(tw)
    try:
        c.feed(raw)
        c.close()
    except Exception:
        pass  # tolerate malformed HTML like bs4's lenient parser

    p_texts = c.p_texts
    used_p = False
    if is_utf8 and p_texts:
        used_p = True
        text = " ".join(t.strip() for t in p_texts)
    else:
        text = "".join(c.all_text)
    text = clean_text(text)

    links = sorted({
        h for h in c.links
        if h.startswith(("http://", "https://")) and h != url
    })
    return PageExtract(
        text=text,
        weighted_text=list(c.weighted.items()),
        links=links,
        title=(c._title or "").strip(),
        is_utf8=is_utf8,
        used_p_branch=used_p,
    )
