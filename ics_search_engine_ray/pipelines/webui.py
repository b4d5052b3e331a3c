"""Minimal search web UI (SURVEY §2 Q7 — the reference's Streamlit surface,
reference main.py:58-211, re-expressed on the stdlib http.server: Streamlit
is not available in this environment and the surface is a thin form +
results list anyway).

Serves GET / with a query box; results show title, url, score and matched
terms — the same fields the reference UI renders (main.py:29-53 title
lookup, result list at main.py:76-91). Backed by either the in-process
SearchIndex or the sharded actor pool (--actors).
"""

from __future__ import annotations

import html
import json
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

_PAGE = """<!doctype html>
<html><head><meta charset="utf-8"><title>ics-search (Ray Data)</title>
<style>
 body {{ font-family: system-ui, sans-serif; margin: 2rem auto; max-width: 46rem; }}
 input[type=text] {{ width: 30rem; padding: .4rem; }}
 .r {{ margin: 1rem 0; }} .t {{ font-weight: 600; }}
 .u {{ color: #171; font-size: .9rem; }} .m {{ color: #666; font-size: .85rem; }}
</style></head><body>
<h2>ics-search-engine (Ray Data)</h2>
<form action="/" method="get">
 <input type="text" name="q" value="{q}" autofocus>
 <select name="scorer"><option value="bm25" {s_bm25}>bm25</option>
 <option value="tfidf-ref" {s_ref}>tfidf-ref</option>
 <option value="boolean" {s_bool}>boolean (+must -not)</option></select>
 <input type="submit" value="Search">
</form>
{body}
</body></html>"""


def _render_results(results, secs: float) -> str:
    if not results:
        return "<p>No results found.</p>"
    rows = []
    for i, r in enumerate(results, 1):
        title = html.escape(r.title or r.url)
        rows.append(
            f'<div class="r"><div class="t">{i}. {title}</div>'
            f'<div class="u"><a href="{html.escape(r.url)}">{html.escape(r.url)}</a>'
            f' &middot; score {r.score:.4f}</div>'
            f'<div class="m">matched: {html.escape(", ".join(sorted(r.matched_terms)))}</div></div>')
    return (f"<p>{len(results)} results in {secs * 1000:.1f} ms</p>"
            + "".join(rows))


def serve(index_dir: str, port: int = 8080, actors: int = 0, max_k: int = 20):
    if actors > 0:
        from ..query.actors import ShardedSearchIndex
        si = ShardedSearchIndex(index_dir, num_actors=actors)
    else:
        from ..query.engine import SearchIndex
        si = SearchIndex(index_dir)

    class Handler(BaseHTTPRequestHandler):
        def do_GET(self):
            u = urlparse(self.path)
            if u.path == "/api":
                self._api(u)
                return
            if u.path != "/":
                self.send_error(404)
                return
            qs = parse_qs(u.query)
            q = (qs.get("q") or [""])[0]
            scorer = (qs.get("scorer") or ["bm25"])[0]
            body = ""
            if q.strip():
                t0 = time.time()
                if scorer == "boolean" and hasattr(si, "search_boolean"):
                    results = si.search_boolean(q, max_k)
                else:
                    results = si.search(q, max_k, scorer=scorer)
                body = _render_results(results, time.time() - t0)
                if not results and hasattr(si, "suggest"):
                    sugg = [t for w in q.split()
                            for t, _ in si.suggest(w, n=2)][:5]
                    if sugg:
                        sc = html.escape(scorer, quote=True)
                        links = ", ".join(
                            f'<a href="/?q={html.escape(s, quote=True)}'
                            f'&scorer={sc}">{html.escape(s)}</a>'
                            for s in sugg)
                        body += f"<p>Did you mean: {links}?</p>"
            page = _PAGE.format(q=html.escape(q, quote=True), body=body,
                                s_bm25="selected" if scorer == "bm25" else "",
                                s_ref="selected" if scorer == "tfidf-ref" else "",
                                s_bool="selected" if scorer == "boolean" else "")
            data = page.encode("utf-8")
            self.send_response(200)
            self.send_header("Content-Type", "text/html; charset=utf-8")
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def _api(self, u):
            qs = parse_qs(u.query)
            q = (qs.get("q") or [""])[0]
            try:
                k = int((qs.get("k") or ["10"])[0])
            except ValueError:
                self.send_error(400, "k must be an integer")
                return
            k = max(1, min(k, max_k))
            scorer = (qs.get("scorer") or ["bm25"])[0]
            if not q.strip():
                results = []
            elif scorer == "boolean" and hasattr(si, "search_boolean"):
                results = si.search_boolean(q, k)
            else:
                results = si.search(q, k, scorer=scorer)
            data = json.dumps([
                {"rank": i, "url": r.url, "title": r.title,
                 "score": round(r.score, 6), "doc_id": r.doc_id,
                 "matched_terms": sorted(r.matched_terms)}
                for i, r in enumerate(results, 1)]).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def log_message(self, fmt, *args):      # quiet
            pass

    srv = ThreadingHTTPServer(("127.0.0.1", port), Handler)
    return srv          # caller runs serve_forever() / shutdown()
