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
from collections import Counter

from searchengine_ray.functions._stopwords_data import STOPWORDS
from searchengine_ray.functions.porter import CachedStemmer

# words possibly containing internal apostrophes or periods, else any single
# non-space, non-word symbol (the round-1 approximation; kept as the fast
# fallback — the reference path now uses the Treebank rules below)
_TOKEN_RE = re.compile(r"[A-Za-z0-9_]+(?:['.][A-Za-z0-9_]+)*|[^\sA-Za-z0-9_]")

_SIMPLE_RE = re.compile(r"[^a-z0-9]+")

# ---------------------------------------------------------------- Treebank
# Penn Treebank tokenization rules (Robert McIntyre's public tokenizer.sed,
# as documented for NLTK's TreebankWordTokenizer — the reference's M6,
# ``lib/tokenize.py:16-45``).  Implemented from the published rule list,
# space-insertion only (characters are never rewritten, so every token is a
# verbatim substring and spans align to the source — NLTK's span_tokenize
# maps its ``/'' conversions back the same way).  Notable behaviors this
# reproduces (and the round-1 regex tokenizer did not): contraction
# splitting (``don't`` → ``do`` + ``n't``, ``cannot`` → ``can`` + ``not``)
# and the final-period rule — only the LAST period of the text is split
# off, so mid-document sentence-enders stay attached (``York.``), exactly
# what indexing whole documents through Treebank produces.
_TB_OPEN_QUOTES = re.compile(r"([«“‘„]|[`]+)")
_TB_APOS_WORD = re.compile(r"(?i)(')(?!re|ve|ll|m|t|s|d|n)(\w)\b")
_TB_PUNCT = [
    (re.compile(r"([^\.])(\.)([\]\)}>\"\'»”’]*)\s*$"), r"\1 \2\3 "),
    (re.compile(r"([:,])([^\d])"), r" \1 \2"),
    (re.compile(r"([:,])$"), r" \1 "),
    # all context-free "pad me" symbols in ONE pass (was 7 separate subs —
    # they are mutually disjoint and only insert spaces, so order-safe):
    # ellipses, sentence/symbol punctuation, parens/brackets, dashes, quotes
    (re.compile(r"\.{2,}|--|[;@#$%&?!*\]\[\(\)\{\}<>\"»”’]"), r" \g<0> "),
]
_TB_CLOSE_QUOTE = re.compile(r"([^'])' ")
_TB_DOUBLE_QUOTE = re.compile(r"(\S)('')")
# clitics: the two sequential passes fused into one ordered alternation
# (bare ' last, mirroring the original pass-1-then-pass-2 priority)
_TB_CLITICS = re.compile(
    r"([^' ])('[sS]|'[mM]|'[dD]|'ll|'LL|'re|'RE|'ve|'VE|n't|N'T|') "
)
# contraction table split by whether the branch needs an apostrophe, so the
# common no-' text skips the second pass entirely (NLTK itself runs each
# CONTRACTIONS pattern as its own sequential sub)
_TB_CONTR_PLAIN = re.compile(
    r"\b(?:(can)(not)|(gim)(me)|(gon)(na)|(got)(ta)|(lem)(me))\b"
    r"|\b(wan)(na)(?=\s)",
    re.IGNORECASE,
)
_TB_CONTR_APOS = re.compile(
    r"\b(?:(d)('ye)|(mor)('n))\b| ('t)(is)\b| ('t)(was)\b", re.IGNORECASE
)


def _contr_sub(m: "re.Match") -> str:
    a, b = (g for g in m.groups() if g is not None)
    return f" {a} {b} "


def treebank_tokens(text: str, _known_lower: bool = False) -> list[str]:
    """Penn-Treebank tokens of ``text`` (verbatim substrings, in order).

    Apostrophe/quote/punctuation-dependent passes are gated on C-speed
    ``in`` checks — a skipped pass can never match (the whole pattern
    requires the probed character), so gating is behavior-neutral and saves
    ~half the regex scans on typical web text.  ``_known_lower=True``
    (set only by :func:`tokenize`'s ASCII fast path) additionally gates the
    rare-word contraction pass on plain substring probes, which is exact
    only when the text is already lowercased."""
    has_apos = "'" in text
    if "«" in text or "“" in text or "‘" in text or "„" in text or "`" in text:
        text = _TB_OPEN_QUOTES.sub(r" \1 ", text)
    if has_apos:
        text = _TB_APOS_WORD.sub(r"\1 \2", text)
    # the colon/comma and final-period passes gate on C-speed membership the
    # same way the apostrophe passes do: a skipped pass cannot match
    if "." in text:
        text = _TB_PUNCT[0][0].sub(_TB_PUNCT[0][1], text)
    if ":" in text or "," in text:
        text = _TB_PUNCT[1][0].sub(_TB_PUNCT[1][1], text)
        text = _TB_PUNCT[2][0].sub(_TB_PUNCT[2][1], text)
    text = _TB_PUNCT[3][0].sub(_TB_PUNCT[3][1], text)
    if has_apos:
        text = _TB_CLOSE_QUOTE.sub(r"\1 ' ", text)
    text = " " + text + " "
    if has_apos:
        if "''" in text:
            text = _TB_DOUBLE_QUOTE.sub(r"\1 \2 ", text)
        text = _TB_CLITICS.sub(r"\1 \2 ", text)
    if not _known_lower or (
        "cannot" in text
        or "gimme" in text
        or "gonna" in text
        or "gotta" in text
        or "lemme" in text
        or "wanna" in text
    ):
        text = _TB_CONTR_PLAIN.sub(_contr_sub, text)
    if has_apos:
        text = _TB_CONTR_APOS.sub(_contr_sub, text)
    return text.split()


def span_tokenize(text: str):
    """Yield (start, end) spans of Treebank tokens, aligned to the source
    text by cursor scan (every token is a verbatim substring in order)."""
    cursor = 0
    for tok in treebank_tokens(text):
        start = text.index(tok, cursor)
        end = start + len(tok)
        yield start, end
        # contraction splits overlap their source word ("cannot" -> "can",
        # "not"): advance to the END of this token, never past it
        cursor = end


def tokenize(text: str) -> list[str]:
    """Lowercased, stripped tokens in order of appearance.

    Mirrors the reference call-shape ``tokenize(text, n=1)[0]``
    (``lib/tokenize.py:16-45``: TreebankWordTokenizer.span_tokenize, then
    ``text[start:end].lower().strip()`` per span; n-grams are unused in
    practice — every call site passes n=1, SURVEY.md §2.2 M6).  Tokens are
    verbatim substrings with no surrounding whitespace, so
    ``text[s:e].lower().strip()`` ≡ ``token.lower()`` — the span
    realignment is skipped on this hot path (``span_tokenize`` remains for
    callers that need offsets).

    Fast path (ASCII, no apostrophe): one C-level ``str.lower`` over the
    whole text replaces the per-token lowers — exactly equivalent there
    because every pass that can fire is case-insensitive ((?i) or
    letter-free) so split positions are unchanged, and ASCII lowercasing is
    context-free per character.  Text WITH apostrophes keeps the per-token
    path: the clitic pass matches only the two canonical case variants
    (``n't``/``N'T`` — NLTK's published rule), so pre-lowering would split
    mixed-case clitics (``Can'T``) the original does not.  Non-ASCII text
    keeps it too: ``str.lower`` applies the Unicode Final_Sigma rule, whose
    context differs between whole-text and per-token application.
    """
    if "'" not in text and text.isascii():
        return treebank_tokens(text.lower(), _known_lower=True)
    return [t.lower() for t in treebank_tokens(text)]


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
    """Token -> frequency, insertion-ordered (``lib/word_count.py:6-16``).

    ``Counter`` is a dict subclass counting at C speed with the same
    first-seen key order as the reference's explicit dict loop."""
    return Counter(tokens)


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
