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

_DROP_RE = re.compile(
    r"<(script|style|nav|header|footer|aside)\b[^>]*>.*?</\1\s*>",
    re.IGNORECASE | re.DOTALL,
)
_BLOCK_RE = re.compile(
    r"<(title|h1|h2|h3|p|li)\b[^>]*>(.*?)</\1\s*>",
    re.IGNORECASE | re.DOTALL,
)
_TAG_RE = re.compile(r"<[^>]+>")
_WS_RE = re.compile(r"\s+")


def extract_text(html: bytes | str) -> str:
    """Deterministic boilerplate-dropping text extraction (spec above)."""
    if isinstance(html, bytes):
        html = html.decode("utf-8", errors="replace")
    html = _DROP_RE.sub(" ", html)
    blocks = []
    for m in _BLOCK_RE.finditer(html):
        inner = _TAG_RE.sub(" ", m.group(2))
        inner = _html.unescape(inner)
        inner = _WS_RE.sub(" ", inner).strip()
        if inner:
            blocks.append(inner)
    return "\n\n".join(blocks)
