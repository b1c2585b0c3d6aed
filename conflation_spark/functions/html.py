"""Stdlib HTML -> text extraction (the trafilatura-shaped step of a web
training-data pipeline, scoped to what html.parser can do exactly).

``extract_text`` inverts the generator-side encoding the WARC fixture
applies: tags stripped, character/entity references resolved
(``convert_charrefs``), ``<script>/<style>/<template>/<noscript>``
subtrees dropped whole, whitespace collapsed to single spaces. The
fixture plants truth from the SOURCE strings before HTML-wrapping, so
oracle equality proves this inversion, not the fixture.

No layout heuristics (boilerplate removal, main-content detection) —
those are model/rule packs, not parsing, and out of scope; every text
node outside the dropped subtrees contributes.
"""

from __future__ import annotations

from html.parser import HTMLParser

_DROP_SUBTREES = {"script", "style", "template", "noscript"}

# block-level elements break text runs (browser semantics: <p>a</p><p>b</p>
# renders "a b", while inline tags concatenate: "three<a>four" -> "threefour")
_BLOCK = {
    "address", "article", "aside", "blockquote", "body", "br", "caption",
    "dd", "div", "dl", "dt", "fieldset", "figcaption", "figure", "footer",
    "form", "h1", "h2", "h3", "h4", "h5", "h6", "head", "header", "hr",
    "html", "li", "main", "nav", "ol", "option", "p", "pre", "section",
    "select", "table", "tbody", "td", "tfoot", "th", "thead", "title",
    "tr", "ul",
}


class _Extractor(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.chunks: list[str] = []
        self.title_chunks: list[str] = []
        self.n_links = 0
        self._drop_depth = 0
        self._in_title = False

    def _break(self, tag: str) -> None:
        if tag in _BLOCK and not self._drop_depth:
            self.chunks.append("\n")

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in _DROP_SUBTREES:
            self._drop_depth += 1
            return
        self._break(tag)
        if tag == "title":
            self._in_title = True
        elif tag == "a" and any(k == "href" for k, _ in attrs):
            self.n_links += 1

    def handle_startendtag(self, tag: str, attrs) -> None:
        # <br/> style self-closed tags break runs but never open subtrees
        self._break(tag)
        if tag == "a" and any(k == "href" for k, _ in attrs):
            self.n_links += 1

    def handle_endtag(self, tag: str) -> None:
        if tag in _DROP_SUBTREES:
            self._drop_depth = max(0, self._drop_depth - 1)
            return
        self._break(tag)
        if tag == "title":
            self._in_title = False

    def handle_data(self, data: str) -> None:
        if self._drop_depth:
            return
        if self._in_title:
            self.title_chunks.append(data)
        else:
            self.chunks.append(data)


def extract_text(html: str) -> tuple[str, str, int]:
    """HTML string -> (body_text, title, n_links); whitespace in both
    texts collapsed to single spaces. Never raises on malformed markup —
    html.parser is a recovering tokenizer, so stray ``<``/unclosed tags
    degrade to best-effort text, matching real-web expectations."""
    p = _Extractor()
    p.feed(html)
    p.close()
    body = " ".join("".join(p.chunks).split())
    title = " ".join("".join(p.title_chunks).split())
    return body, title, p.n_links


__all__ = ["extract_text"]
