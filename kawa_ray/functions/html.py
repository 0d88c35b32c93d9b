"""Pure, deterministic HTML -> text extraction (pipeline stage S1).

The extracted text must be **byte-identical per url** across any
parallelism level (BASELINE.json ``input_hint``), so this is a pure
function of the ``html`` bytes only: no shared state, no locale, no
ordering dependence.

Extraction spec (frozen — tests pin golden bytes):

1. decode UTF-8 (errors="replace")
2. drop ``<script>``/``<style>`` elements with their content
3. drop boilerplate elements with their content: ``<nav>``, ``<header>``,
   ``<footer>``, ``<aside>``
4. collect, in document order, the inner text of ``<title>``, ``<h1>``..
   ``<h3>``, ``<p>`` and ``<li>`` elements
5. inside each block: strip residual tags, decode HTML entities
   (``&amp;`` ``&#233;`` ...), collapse all whitespace runs to single
   spaces, strip ends
6. join non-empty blocks with ``"\\n\\n"``

The reference has no HTML stage (its corpus enters as text); the stage is
mandated by the north rule's Common-Crawl-shaped input.
"""

from __future__ import annotations

import html as _html
import re

_DROP_OPEN_RE = re.compile(
    r"<(script|style|nav|header|footer|aside)\b[^>]*>", re.IGNORECASE
)
_BLOCK_OPEN_RE = re.compile(r"<(title|h1|h2|h3|p|li)\b[^>]*>", re.IGNORECASE)
_TAG_RE = re.compile(r"<[^>]+>")
_WS_RE = re.compile(r"\s+")
_CLOSE_RES = {
    t: re.compile(rf"</{t}\s*>", re.IGNORECASE)
    for t in ("script", "style", "nav", "header", "footer", "aside",
              "title", "h1", "h2", "h3", "p", "li")
}


def _drop_elements(html: str) -> str:
    """Linear single-cursor removal of boilerplate elements.  A
    backtracking ``<tag>.*?</tag>`` regex goes quadratic on pages with
    many unclosed openers (35s+ on a 340 KB pathological page); the
    cursor visits each position once.  Unclosed boilerplate drops to end
    of document (strictly safer than keeping script payloads)."""
    out: list[str] = []
    pos = 0
    while True:
        m = _DROP_OPEN_RE.search(html, pos)
        if m is None:
            out.append(html[pos:])
            break
        out.append(html[pos:m.start()])
        out.append(" ")
        close = _CLOSE_RES[m.group(1).lower()].search(html, m.end())
        if close is None:
            break
        pos = close.end()
    return "".join(out)


def _iter_blocks(html: str):
    """Linear scan yielding inner text of block elements (first matching
    closer, document order) — same output as the old non-greedy regex on
    well-formed pages, linear on pathological ones."""
    pos = 0
    no_close_after: dict[str, int] = {}
    while True:
        m = _BLOCK_OPEN_RE.search(html, pos)
        if m is None:
            return
        tag = m.group(1).lower()
        start = m.end()
        # a failed closer search proves no closer exists past that point;
        # remember it so repeated unclosed openers stay linear
        if start >= no_close_after.get(tag, 1 << 62):
            pos = start
            continue
        close = _CLOSE_RES[tag].search(html, start)
        if close is None:
            no_close_after[tag] = start
            pos = start
            continue
        yield html[start:close.start()]
        pos = close.end()


# pages larger than this are truncated before parsing (crawler practice:
# bounds the backtracking-regex cost on pathological pages; deterministic
# because the cap is part of the frozen spec)
MAX_HTML_BYTES = 4 * 1024 * 1024


def extract_text(html: bytes | str) -> str:
    """Deterministic boilerplate-dropping text extraction (spec above)."""
    if isinstance(html, bytes):
        html = html[:MAX_HTML_BYTES].decode("utf-8", errors="replace")
    elif len(html) > MAX_HTML_BYTES:
        html = html[:MAX_HTML_BYTES]
    html = _drop_elements(html)
    blocks = []
    for raw in _iter_blocks(html):
        inner = _TAG_RE.sub(" ", raw)
        inner = _html.unescape(inner)
        inner = _WS_RE.sub(" ", inner).strip()
        if inner:
            blocks.append(inner)
    return "\n\n".join(blocks)
