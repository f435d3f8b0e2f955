"""HTML extraction: text, important-tag token sets, links.

The reference extracts with BeautifulSoup+lxml (``makeindex.py:151-189``):

- ``soup.get_text()`` — concatenation of every text node in document order,
  including ``<script>``/``<style>`` contents, with entities decoded
  (``makeindex.py:155``). This is the per-row byte-identity invariant.
- important-tag token sets: for tags title/h1-h4/b/strong/mark in priority
  order, ``find_all(tag)`` then ``get_text()`` then ``decompose()``
  (``makeindex.py:159-174``). Because each processed tag is *decomposed*,
  a text node is attributed only to its highest-priority enclosing
  important tag, and links inside important tags are lost to the later
  link pass. This module replicates both behaviors.
- links: ``find_all('a', href=True)`` on the (partially decomposed) tree →
  ``urljoin(base, href)`` → ``urldefrag`` → set (``makeindex.py:177-187``).

bs4/lxml are not available in this environment, so the extractor is built on
the stdlib ``html.parser`` with ``convert_charrefs=True`` (entities decoded in
data, like bs4). The synthesized pages tables carry a ``text`` column produced
by this same extractor, making "byte-identical extracted text per url"
(BASELINE.json input_hint) a testable invariant of the distributed pipeline.
"""

from __future__ import annotations

import re
from html import unescape
from html.parser import HTMLParser
from urllib.parse import urldefrag, urljoin

from searchengine_ray.params import IMPORTANT_TAGS

_IMPORTANT_TAG_NAMES = tuple(t for t, _ in IMPORTANT_TAGS)
_PRIORITY = {t: i for i, (t, _) in enumerate(IMPORTANT_TAGS)}
# void elements never get an end tag
_VOID = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)


class _Extractor(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.text_parts: list[str] = []
        # per important tag name: list of text chunks inside that tag while it
        # is the highest-priority open important tag
        self.tag_texts: dict[str, list[str]] = {t: [] for t in _IMPORTANT_TAG_NAMES}
        self.hrefs: list[str] = []
        # open important tags as a stack of (name, priority)
        self._open: list[tuple[str, int]] = []

    def _top_priority_tag(self) -> str | None:
        if not self._open:
            return None
        best = min(self._open, key=lambda x: x[1])
        return best[0]

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in _PRIORITY and tag not in _VOID:
            self._open.append((tag, _PRIORITY[tag]))
        elif tag == "a":
            # links inside important tags are decomposed before the link pass
            # in the reference (makeindex.py:168-187) — drop them
            if not self._open:
                for k, v in attrs:
                    if k == "href" and v is not None:
                        self.hrefs.append(v)
                        break

    def handle_endtag(self, tag: str) -> None:
        if tag in _PRIORITY:
            for i in range(len(self._open) - 1, -1, -1):
                if self._open[i][0] == tag:
                    del self._open[i]
                    break

    def handle_data(self, data: str) -> None:
        self.text_parts.append(data)
        top = self._top_priority_tag()
        if top is not None:
            self.tag_texts[top].append(data)


# ---- fast path: regex tag scanner driving the SAME _Extractor handlers.
# Falls back to the full HTMLParser whenever the document contains anything
# the scanner cannot prove safe: comments/doctype/PIs (`<!`, `<?`),
# rawtext elements (script/style switch HTMLParser into CDATA mode), a `<`
# not opening a tag, or a tag body whose quoting could hide a `>`.
_FALLBACK_RE = re.compile(r"(?i:<script|<style)|<(?![a-zA-Z]|/[a-zA-Z])")
_TAG_RE = re.compile(r"<(/?)([a-zA-Z][a-zA-Z0-9:_.-]*)([^>]*)>")
# one attribute, HTMLParser-tolerant shape: name, optional =value
_ATTR_RE = re.compile(
    r"""\s*([^\s/=>]+)(?:\s*=\s*("[^"]*"|'[^']*'|[^\s>]*))?"""
)


class _NeedsFullParser(Exception):
    pass


# scheme://non-empty-authority — the base-independent urljoin fast path
_ABS_AUTH_RE = re.compile(r"[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]")
# (base scheme, href) → defragged absolute url ("" = unparseable, skip);
# per-process, bounded
_LINK_MEMO: dict[tuple[str, str], str] = {}


def _attrs_href(body: str) -> list[tuple[str, str]]:
    """Sequential attr scan of a start-tag body, returning the first href
    (mirrors HTMLParser's attrfind loop — a 'href=' inside another attr's
    quoted VALUE is not an attribute)."""
    pos = 0
    n = len(body)
    while pos < n:
        m = _ATTR_RE.match(body, pos)
        if m is None or m.end() == pos:
            rest = body[pos:].strip()
            if rest in ("", "/"):
                break
            raise _NeedsFullParser
        k, v = m.groups()
        if k.lower() == "href" and v is not None:
            if v[:1] in "\"'" and v[:1] == v[-1:] and len(v) >= 2:
                v = v[1:-1]
            return [("href", unescape(v) if "&" in v else v)]
        pos = m.end()
    return []


def _fast_feed(p: _Extractor, html: str) -> None:
    """Drive ``p``'s handlers via a single finditer scan.  Raises
    ``_NeedsFullParser`` when a construct appears mid-scan that only the
    full parser resolves exactly (odd quoting in a tag body, a tag-like
    ``<`` that never closes, junk after a tag name)."""
    pos = 0
    for m in _TAG_RE.finditer(html):
        if m.start() > pos:
            data = html[pos : m.start()]
            if "<" in data:
                raise _NeedsFullParser  # an unterminated tag-like '<'
            p.handle_data(unescape(data) if "&" in data else data)
        closing, name, body = m.groups()
        if body:
            if body.count('"') % 2 or body.count("'") % 2:
                raise _NeedsFullParser  # a quoted '>' may have split this tag
            if closing:
                if body.strip():
                    raise _NeedsFullParser  # attrs on an end tag
            elif body[0] not in " \t\n\r\f/":
                raise _NeedsFullParser  # tag-name chars beyond our pattern
        name = name.lower()
        if closing:
            p.handle_endtag(name)
        else:
            # self-closing iff the '/' is NOT swallowed by an unquoted attr
            # value (HTMLParser: <a href=x/> parses value "x/", no endtag)
            startend = body == "/" or (
                body.endswith("/") and body[-2] in " \t\n\r\f\"'"
            )
            attrs = (
                _attrs_href(body)
                if name == "a" and body and not p._open
                else []
            )
            p.handle_starttag(name, attrs)
            if startend:
                p.handle_endtag(name)
        pos = m.end()
    if pos < len(html):
        tail = html[pos:]
        if "<" in tail:
            raise _NeedsFullParser
        p.handle_data(unescape(tail) if "&" in tail else tail)


def extract(html: str, base_url: str) -> tuple[str, dict[str, str], list[str]]:
    """Extract (text, {tag: tag_text}, out_links) from one page.

    - ``text``: concatenation of all text nodes (the byte-identity field).
    - ``tag_text``: per important tag, the concatenated text attributed to it
      (caller tokenizes into the per-tag token *set*, makeindex.py:172).
    - ``out_links``: defragged absolute URLs in first-seen order, deduped
      (reference keeps a ``set``; order is normalized downstream).

    Dispatches to the fast scanner unless the document contains constructs
    only the full parser handles; both paths drive the same ``_Extractor``
    handlers (equivalence pinned by ``test_fast_path_matches_htmlparser``).
    """
    p = _Extractor()
    if _FALLBACK_RE.search(html) is None:
        try:
            _fast_feed(p, html)
        except _NeedsFullParser:
            p = _Extractor()
            p.feed(html)
            p.close()
    else:
        p.feed(html)
        p.close()
    text = "".join(p.text_parts)
    tag_text = {t: "".join(parts) for t, parts in p.tag_texts.items() if parts}
    links: list[str] = []
    seen: set[str] = set()
    base_scheme = base_url.partition(":")[0]
    for href in p.hrefs:
        # For an absolute href with a non-empty authority, urljoin's result
        # depends only on the href and whether its scheme equals the
        # base's (equal → re-serialized via urlunsplit; different →
        # returned verbatim) — never on the base's netloc/path.  Memoizing
        # on (base scheme, href) is therefore EXACT, and urljoin/urldefrag
        # are the hot Python calls of link extraction (~0.09 ms/link).
        memo_key = None
        if _ABS_AUTH_RE.match(href) is not None:
            memo_key = (base_scheme, href)
            defragged = _LINK_MEMO.get(memo_key)
            if defragged is not None:
                if defragged and defragged not in seen:
                    seen.add(defragged)
                    links.append(defragged)
                continue
        try:
            defragged = urldefrag(urljoin(base_url, href)).url
        except ValueError:
            defragged = ""  # memoized as "skip" below
        if memo_key is not None and len(_LINK_MEMO) < 1_000_000:
            _LINK_MEMO[memo_key] = defragged
        if defragged and defragged not in seen:
            seen.add(defragged)
            links.append(defragged)
    return text, tag_text, links


def defrag(url: str) -> str:
    """``urldefrag(url).url`` (``makeindex.py:118``)."""
    try:
        return urldefrag(url).url
    except ValueError:
        return url
