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


def extract(html: str, base_url: str) -> tuple[str, dict[str, str], list[str]]:
    """Extract (text, {tag: tag_text}, out_links) from one page.

    - ``text``: concatenation of all text nodes (the byte-identity field).
    - ``tag_text``: per important tag, the concatenated text attributed to it
      (caller tokenizes into the per-tag token *set*, makeindex.py:172).
    - ``out_links``: defragged absolute URLs in first-seen order, deduped
      (reference keeps a ``set``; order is normalized downstream).
    """
    p = _Extractor()
    p.feed(html)
    p.close()
    text = "".join(p.text_parts)
    tag_text = {t: "".join(parts) for t, parts in p.tag_texts.items() if parts}
    links: list[str] = []
    seen: set[str] = set()
    for href in p.hrefs:
        try:
            absolute = urljoin(base_url, href)
            defragged = urldefrag(absolute).url
        except ValueError:
            continue
        if defragged not in seen:
            seen.add(defragged)
            links.append(defragged)
    return text, tag_text, links


def defrag(url: str) -> str:
    """``urldefrag(url).url`` (``makeindex.py:118``)."""
    try:
        return urldefrag(url).url
    except ValueError:
        return url
