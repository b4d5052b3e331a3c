"""HTML text / important-tag / link extraction on the stdlib ``html.parser``.

Mirrors the reference's BeautifulSoup(html.parser) usage (reference:
components/document_processor.py:38-91) without depending on bs4 (not
available here):

- ``soup.get_text()``  -> concatenation of every text node, no separator
  (script/style contents included, entity refs decoded);
- branch rule (document_processor.py:42-46): if the page is utf-8 and has
  ``<p>`` tags, text = ``' '.join(p.get_text().strip() for p in ps)``,
  else the full-document text; both cleaned with :func:`clean_text`.
  ``input_hint`` pages have no ``encoding`` column, so "is utf-8" is defined
  as "the html bytes decode strictly as utf-8";
- important text (document_processor.py:50-59): for each tag in TAG_WEIGHTS,
  per-element ``get_text().strip()``; identical strings accumulate weight
  (nested important tags each collect their own subtree, as bs4 find_all does);
- links (document_processor.py:81-91): every ``<a href>`` starting with
  http:// or https:// and != the page url, deduplicated. The reference's
  ``list(set(...))`` order is hash-seed dependent; we sort for determinism
  (documented divergence — reference order was never stable).

Known divergence: nested ``<p>`` inside ``<p>`` is counted once here (bs4
would count the inner text twice via both elements). Real HTML cannot nest
``<p>``, and the synthetic corpus never does.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from html.parser import HTMLParser
from typing import Dict, List, Optional, Tuple

from ..config import TAG_WEIGHTS
from .textclean import clean_text


@dataclass
class PageExtract:
    text: str                                  # cleaned extracted text (M2/M3)
    weighted_text: List[Tuple[str, float]]     # (distinct text, summed weight) (M4)
    links: List[str]                           # sorted unique external links (M5)
    title: str                                 # first <title> text (doc_titles)
    is_utf8: bool
    used_p_branch: bool


class _Collector(HTMLParser):
    def __init__(self, tag_weights: Dict[str, float]):
        super().__init__(convert_charrefs=True)
        self.tag_weights = tag_weights
        self.all_text: List[str] = []
        self.p_texts: List[str] = []
        self._p_depth = 0
        self._p_buf: List[str] = []
        # stack of [tag, buffer] for open important elements
        self._imp_stack: List[List] = []
        self.weighted: Dict[str, float] = {}
        self.links: List[str] = []
        self._title: Optional[str] = None
        self._title_buf: Optional[List[str]] = None

    def handle_starttag(self, tag, attrs):
        if tag == "p":
            if self._p_depth == 0:
                self._p_buf = []
            self._p_depth += 1
        if tag in self.tag_weights:
            self._imp_stack.append([tag, []])
        if tag == "title" and self._title is None:
            self._title_buf = []
        if tag == "a":
            for k, v in attrs:
                if k == "href" and v:
                    self.links.append(v)
                    break

    def handle_endtag(self, tag):
        if tag == "p" and self._p_depth > 0:
            self._p_depth -= 1
            if self._p_depth == 0:
                self.p_texts.append("".join(self._p_buf))
        if tag in self.tag_weights:
            for i in range(len(self._imp_stack) - 1, -1, -1):
                if self._imp_stack[i][0] == tag:
                    _, buf = self._imp_stack.pop(i)
                    text = "".join(buf).strip()
                    if text:
                        self.weighted[text] = self.weighted.get(text, 0.0) + self.tag_weights[tag]
                    break
        if tag == "title" and self._title_buf is not None:
            self._title = "".join(self._title_buf)
            self._title_buf = None

    def handle_data(self, data):
        if not data:
            return
        self.all_text.append(data)
        if self._p_depth > 0:
            self._p_buf.append(data)
        for frame in self._imp_stack:
            frame[1].append(data)
        if self._title_buf is not None:
            self._title_buf.append(data)

    def close(self):
        super().close()
        # unclosed elements at EOF: bs4 still yields their collected text
        if self._p_depth > 0 and self._p_buf:
            self.p_texts.append("".join(self._p_buf))
            self._p_depth = 0
        while self._imp_stack:
            tag, buf = self._imp_stack.pop()
            text = "".join(buf).strip()
            if text:
                self.weighted[text] = self.weighted.get(text, 0.0) + self.tag_weights[tag]
        if self._title_buf is not None:
            self._title = "".join(self._title_buf)
            self._title_buf = None


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

    used_p = False
    if is_utf8 and c.p_texts:
        used_p = True
        text = " ".join(t.strip() for t in c.p_texts)
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
