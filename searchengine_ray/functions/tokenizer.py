"""Tokenization.

The reference tokenizes with NLTK's ``TreebankWordTokenizer.span_tokenize``
and lowercases/strips each span (``lib/tokenize.py:16-45``). NLTK is not
available here, so :func:`tokenize` implements a deterministic span-based
regex tokenizer with Treebank-like behavior for the cases the corpus
exercises: words (with internal apostrophes/periods kept, so ``don't`` and
``3.14`` stay single tokens) and every other non-space symbol as its own
token (so ``print("Hello world!")`` yields ``print ( " hello world ! " )`` —
the TEST.txt query-15 case). Parity is defined against the serial oracle,
which shares this function.

Two tokenizers live here:

- :func:`tokenize` — the search-engine tokenizer (span-based, punctuation
  tokens included), used by the index build and query path.
- :func:`simple_tokens` — lowercase split on ``[^a-z0-9]+``; used by the
  documents-table operators whose DuckDB oracle SQL must express the same
  tokenization (``regexp_split_to_array(lower(text), '[^a-z0-9]+')``).
"""

from __future__ import annotations

import re

from searchengine_ray.functions._stopwords_data import STOPWORDS
from searchengine_ray.functions.porter import CachedStemmer

# words possibly containing internal apostrophes or periods, else any single
# non-space, non-word symbol
_TOKEN_RE = re.compile(r"[A-Za-z0-9_]+(?:['.][A-Za-z0-9_]+)*|[^\sA-Za-z0-9_]")

_SIMPLE_RE = re.compile(r"[^a-z0-9]+")


def span_tokenize(text: str):
    """Yield (start, end) spans of tokens."""
    for m in _TOKEN_RE.finditer(text):
        yield m.span()


def tokenize(text: str) -> list[str]:
    """Lowercased, stripped tokens in order of appearance.

    Mirrors the reference call-shape ``tokenize(text, n=1)[0]``
    (``lib/tokenize.py:16-45``; n-grams are unused in practice — every call
    site passes n=1, SURVEY.md §2.2 M6).
    """
    return [m.group(0).lower().strip() for m in _TOKEN_RE.finditer(text)]


def ngrams(tokens: list[str], n: int) -> list[str]:
    """Space-joined n-grams over the token sequence (``lib/tokenize.py``'s
    n-gram builder; every reference call site passes n=1 so this is unused
    in practice — SURVEY.md §2.2 M6 — but kept for surface parity)."""
    if n <= 1:
        return list(tokens)
    return [" ".join(tokens[i : i + n]) for i in range(len(tokens) - n + 1)]


def stem_tokens(tokens: list[str], stemmer: CachedStemmer | None = None) -> list[str]:
    """Porter-stem a token list (``lib/tokenize.py:57-62``)."""
    st = stemmer or _DEFAULT_STEMMER
    return [st.stem(t) for t in tokens]


def word_count(tokens: list[str]) -> dict[str, int]:
    """Token -> frequency, insertion-ordered (``lib/word_count.py:6-16``)."""
    d: dict[str, int] = {}
    for t in tokens:
        d[t] = d.get(t, 0) + 1
    return d


def is_stopword(word: str) -> bool:
    """Membership in the 174-word list (``lib/stopwords.py:14-22``)."""
    return word in STOPWORDS


def simple_tokens(text: str) -> list[str]:
    """Lowercase, split on non-[a-z0-9]; drop empties.

    SQL-parity tokenizer: DuckDB equivalent is
    ``list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '')``.
    """
    return [t for t in _SIMPLE_RE.split(text.lower()) if t]


_DEFAULT_STEMMER = CachedStemmer()
