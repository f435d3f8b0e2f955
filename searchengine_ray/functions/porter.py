"""Porter stemmer, implemented from scratch from the published algorithm
(M.F. Porter, "An algorithm for suffix stripping", Program 14(3), 1980).

The reference stems with NLTK's ``PorterStemmer`` (``lib/tokenize.py:12,57-62``).
NLTK is not available in this environment, so this module implements the
original published algorithm (plus NLTK's guard of returning words of length
<= 2 unchanged). All parity tests in this repo are against the serial oracle
in ``searchengine_ray.oracle``, which uses this same stemmer — the invariant
under test is distributed == serial semantics, not NLTK equality.
"""

from __future__ import annotations

_VOWELS = frozenset("aeiou")


def _is_cons(word: str, i: int) -> bool:
    ch = word[i]
    if ch in _VOWELS:
        return False
    if ch == "y":
        # y is a consonant at position 0 or when preceded by a vowel;
        # a vowel when preceded by a consonant.
        return i == 0 or not _is_cons(word, i - 1)
    return True


def _measure(stem: str) -> int:
    """Number of VC sequences in ``stem`` ([C](VC)^m[V] form)."""
    m = 0
    i = 0
    n = len(stem)
    # skip initial consonants
    while i < n and _is_cons(stem, i):
        i += 1
    while i < n:
        # in vowel run
        while i < n and not _is_cons(stem, i):
            i += 1
        if i >= n:
            break
        m += 1
        while i < n and _is_cons(stem, i):
            i += 1
    return m


def _has_vowel(stem: str) -> bool:
    return any(not _is_cons(stem, i) for i in range(len(stem)))


def _ends_double_cons(word: str) -> bool:
    return (
        len(word) >= 2
        and word[-1] == word[-2]
        and _is_cons(word, len(word) - 1)
    )


def _ends_cvc(word: str) -> bool:
    """*o: stem ends cvc where the final c is not w, x or y."""
    n = len(word)
    if n < 3:
        return False
    return (
        _is_cons(word, n - 3)
        and not _is_cons(word, n - 2)
        and _is_cons(word, n - 1)
        and word[n - 1] not in "wxy"
    )


# (suffix, replacement, min_measure) rule tables; longest suffix wins.
_STEP2 = [
    ("ational", "ate"), ("tional", "tion"), ("enci", "ence"), ("anci", "ance"),
    ("izer", "ize"), ("abli", "able"), ("alli", "al"), ("entli", "ent"),
    ("eli", "e"), ("ousli", "ous"), ("ization", "ize"), ("ation", "ate"),
    ("ator", "ate"), ("alism", "al"), ("iveness", "ive"), ("fulness", "ful"),
    ("ousness", "ous"), ("aliti", "al"), ("iviti", "ive"), ("biliti", "ble"),
]
_STEP3 = [
    ("icate", "ic"), ("ative", ""), ("alize", "al"), ("iciti", "ic"),
    ("ical", "ic"), ("ful", ""), ("ness", ""),
]
_STEP4 = [
    "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
    "ment", "ent", "ion", "ou", "ism", "ate", "iti", "ous", "ive", "ize",
]


def _longest_rule(word: str, rules):
    """Return the rule with the longest suffix matching ``word`` (or None)."""
    best = None
    for rule in rules:
        suf = rule if isinstance(rule, str) else rule[0]
        if word.endswith(suf) and (best is None or len(suf) > _blen(best)):
            best = rule
    return best


def _blen(rule) -> int:
    return len(rule) if isinstance(rule, str) else len(rule[0])


def stem(word: str) -> str:
    """Stem one (already lowercased) word."""
    if len(word) <= 2:
        return word

    w = word

    # --- step 1a ---
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith("ies"):
        w = w[:-2]
    elif w.endswith("ss"):
        pass
    elif w.endswith("s"):
        w = w[:-1]

    # --- step 1b ---
    extra = False
    if w.endswith("eed"):
        if _measure(w[:-3]) > 0:
            w = w[:-1]
    elif w.endswith("ed"):
        if _has_vowel(w[:-2]):
            w = w[:-2]
            extra = True
    elif w.endswith("ing"):
        if _has_vowel(w[:-3]):
            w = w[:-3]
            extra = True
    if extra:
        if w.endswith(("at", "bl", "iz")):
            w += "e"
        elif _ends_double_cons(w) and not w.endswith(("l", "s", "z")):
            w = w[:-1]
        elif _measure(w) == 1 and _ends_cvc(w):
            w += "e"

    # --- step 1c ---
    if w.endswith("y") and _has_vowel(w[:-1]):
        w = w[:-1] + "i"

    # --- step 2 ---
    rule = _longest_rule(w, _STEP2)
    if rule is not None:
        suf, rep = rule
        if _measure(w[: -len(suf)]) > 0:
            w = w[: -len(suf)] + rep

    # --- step 3 ---
    rule = _longest_rule(w, _STEP3)
    if rule is not None:
        suf, rep = rule
        if _measure(w[: -len(suf)]) > 0:
            w = w[: -len(suf)] + rep

    # --- step 4 ---
    suf = _longest_rule(w, _STEP4)
    if suf is not None:
        stem_part = w[: -len(suf)]
        if _measure(stem_part) > 1:
            if suf == "ion":
                if stem_part.endswith(("s", "t")):
                    w = stem_part
            else:
                w = stem_part

    # --- step 5a ---
    if w.endswith("e"):
        m = _measure(w[:-1])
        if m > 1 or (m == 1 and not _ends_cvc(w[:-1])):
            w = w[:-1]

    # --- step 5b ---
    if _measure(w) > 1 and _ends_double_cons(w) and w.endswith("l"):
        w = w[:-1]

    return w


class CachedStemmer:
    """Memoizing stemmer for hot loops (vocabulary is Zipfian, so the cache
    hit rate is high). One instance per tokenize actor (SURVEY.md §2.2 M7)."""

    def __init__(self) -> None:
        self._cache: dict[str, str] = {}

    def stem(self, word: str) -> str:
        s = self._cache.get(word)
        if s is None:
            s = stem(word)
            if len(self._cache) < 2_000_000:
                self._cache[word] = s
        return s
