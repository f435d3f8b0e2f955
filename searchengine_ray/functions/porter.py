"""Porter stemmer with two modes, implemented from scratch from the
published algorithm (M.F. Porter, "An algorithm for suffix stripping",
Program 14(3), 1980) and from NLTK's publicly documented extensions.

The reference stems with NLTK's ``PorterStemmer`` in its default
``NLTK_EXTENSIONS`` mode (``lib/tokenize.py:12,57-62``). NLTK is not
installable in this environment, so both behaviors are re-implemented here:

- ``mode="porter"`` — the 1980 paper, rule for rule (plus NLTK's guard of
  returning words of length <= 2 unchanged).
- ``mode="nltk"`` (default, matching the reference) — the paper plus NLTK's
  documented extensions: the irregular-forms pool (sky/dying/news/...),
  the ``ies``/``ied`` 4-letter-word rules (dies→die, spied→spi), the
  step-1c y→i condition (y preceded by a consonant that isn't the whole
  stem: happy→happi but enjoy→enjoy, say→say), the apply-``alli``-first
  re-entry in step 2, and the ``fulli``→ful / ``logi``→log rules. Rule
  application is NLTK's first-match-stops semantics (the first rule whose
  suffix matches is the only one considered). Anchored by the published
  NLTK docstring demo goldens in ``tests/test_functions.py``.
"""

from __future__ import annotations

MODE_PORTER = "porter"  # Porter 1980, paper-exact
MODE_NLTK = "nltk"  # NLTK PorterStemmer NLTK_EXTENSIONS behavior
DEFAULT_MODE = MODE_NLTK

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
    """Number of VC sequences in ``stem`` ([C](VC)^m[V] form).

    Single linear pass resolving each char's consonant-ness from the
    previous char's (the y rule) — equivalent to scanning with
    :func:`_is_cons` per position, without its per-char call/recursion
    (this is the stemmer's hottest helper)."""
    m = 0
    prev_cons = False
    in_vowel_run = False
    for i, ch in enumerate(stem):
        if ch in _VOWELS:
            cons = False
        elif ch == "y":
            cons = i == 0 or not prev_cons
        else:
            cons = True
        if cons:
            if in_vowel_run:
                m += 1
                in_vowel_run = False
        else:
            in_vowel_run = True
        prev_cons = cons
    return m


def _has_vowel(stem: str) -> bool:
    prev_cons = False
    for i, ch in enumerate(stem):
        if ch in _VOWELS:
            return True
        if ch == "y":
            cons = i == 0 or not prev_cons
            if not cons:
                return True
        else:
            cons = True
        prev_cons = cons
    return False


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


def stem(word: str, mode: str = DEFAULT_MODE) -> str:
    """Stem one (already lowercased) word."""
    if mode == MODE_NLTK:
        return _stem_nltk(word)
    return _stem_porter1980(word)


def _stem_porter1980(word: str) -> str:
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


# ---------------------------------------------------------------------------
# NLTK_EXTENSIONS mode (the reference's actual stemmer behavior).
# ---------------------------------------------------------------------------

# Irregular forms drawn to Porter's attention over the algorithm's lifetime;
# NLTK checks this pool before running any step.
_NLTK_POOL: dict[str, str] = {}
for _key, _forms in {
    "sky": ["sky", "skies"],
    "die": ["dying"],
    "lie": ["lying"],
    "tie": ["tying"],
    "news": ["news"],
    "inning": ["innings", "inning"],
    "outing": ["outings", "outing"],
    "canning": ["cannings", "canning"],
    "howe": ["howe"],
    "proceed": ["proceed"],
    "exceed": ["exceed"],
    "succeed": ["succeed"],
}.items():
    for _form in _forms:
        _NLTK_POOL[_form] = _key
del _key, _forms, _form


def _pos_measure(stem_part: str) -> bool:
    return _measure(stem_part) > 0


def _apply_first(word: str, rules) -> str:
    """NLTK-style rule application: the FIRST rule whose suffix matches is
    the only one considered; if its condition fails, the word is returned
    unchanged without trying any later rule. ``"*d"`` matches a trailing
    double consonant; ``""`` matches unconditionally (stem = whole word)."""
    for suffix, replacement, cond in rules:
        if suffix == "*d":
            if _ends_double_cons(word):
                stem_part = word[:-2]
                if cond is None or cond(stem_part):
                    return stem_part + replacement
                return word
            continue
        if word.endswith(suffix):
            stem_part = word[: len(word) - len(suffix)] if suffix else word
            if cond is None or cond(stem_part):
                return stem_part + replacement
            return word
    return word


def _make_dispatch(rules):
    """Bucket a static rule list by suffix last char (order preserved).

    A word has one last character, so only its bucket's rules can match —
    trying them in original order is exactly ``_apply_first``'s
    first-match semantics, minus the dead ``endswith`` scans.  Only valid
    for lists with no ``"*d"`` / ``""`` special rules."""
    d: dict[str, list] = {}
    for r in rules:
        d.setdefault(r[0][-1], []).append(r)
    return d


def _apply_first_d(word: str, dispatch) -> str:
    rules = dispatch.get(word[-1]) if word else None
    if rules is None:
        return word
    for suffix, replacement, cond in rules:
        if word.endswith(suffix):
            stem_part = word[: len(word) - len(suffix)]
            if cond is None or cond(stem_part):
                return stem_part + replacement
            return word
    return word


_STEP1A_D = _make_dispatch(
    [("sses", "ss", None), ("ies", "i", None), ("ss", "ss", None), ("s", "", None)]
)


def _nltk_step1a(word: str) -> str:
    # extension: 4-letter "ies" keeps the e (dies->die, ties->tie) while
    # longer words drop it (flies->fli)
    if word.endswith("ies") and len(word) == 4:
        return word[:-3] + "ie"
    return _apply_first_d(word, _STEP1A_D)


def _nltk_step1b(word: str) -> str:
    # extension: "ied" mirrors the step-1a "ies" rule (died->die, spied->spi)
    if word.endswith("ied"):
        return word[:-3] + ("ie" if len(word) == 4 else "i")
    if word.endswith("eed"):
        stem_part = word[:-3]
        return stem_part + "ee" if _measure(stem_part) > 0 else word
    intermediate = None
    for suffix in ("ed", "ing"):
        if word.endswith(suffix):
            s = word[: -len(suffix)]
            if _has_vowel(s):
                intermediate = s
            break
    if intermediate is None:
        return word
    last = intermediate[-1]
    return _apply_first(
        intermediate,
        [
            ("at", "ate", None),
            ("bl", "ble", None),
            ("iz", "ize", None),
            ("*d", last, lambda _s: last not in ("l", "s", "z")),
            ("", "e", lambda s: _measure(s) == 1 and _ends_cvc(s)),
        ],
    )


def _nltk_step1c(word: str) -> str:
    # extension: y->i only when y follows a consonant that isn't the entire
    # stem ((*c and not c) Y -> I): happy->happi, enjoy->enjoy, cry->cri
    if word.endswith("y"):
        s = word[:-1]
        if len(s) > 1 and _is_cons(s, len(s) - 1):
            return s + "i"
    return word


_STEP2_D = _make_dispatch(
    [
        ("ational", "ate", _pos_measure),
        ("tional", "tion", _pos_measure),
        ("enci", "ence", _pos_measure),
        ("anci", "ance", _pos_measure),
        ("izer", "ize", _pos_measure),
        # NLTK uses the paper's later bli->ble variant, not abli->able
        ("bli", "ble", _pos_measure),
        ("alli", "al", _pos_measure),
        ("entli", "ent", _pos_measure),
        ("eli", "e", _pos_measure),
        ("ousli", "ous", _pos_measure),
        ("ization", "ize", _pos_measure),
        ("ation", "ate", _pos_measure),
        ("ator", "ate", _pos_measure),
        ("alism", "al", _pos_measure),
        ("iveness", "ive", _pos_measure),
        ("fulness", "ful", _pos_measure),
        ("ousness", "ous", _pos_measure),
        ("aliti", "al", _pos_measure),
        ("iviti", "ive", _pos_measure),
        ("biliti", "ble", _pos_measure),
        # extensions
        ("fulli", "ful", _pos_measure),
        # the l of "logi" stays with the stem so short stems (geo-,
        # theo-) behave like long ones (archaeo-): condition sees
        # word[:-4]; re-attaching the l makes it the paper's word[:-3]
        ("logi", "log", lambda s: _measure(s + "l") > 0),
    ]
)


def _nltk_step2(word: str) -> str:
    # extension: apply alli->al BEFORE the table and re-enter step 2
    if word.endswith("alli") and _measure(word[:-4]) > 0:
        return _nltk_step2(word[:-4] + "al")
    return _apply_first_d(word, _STEP2_D)


_STEP3_D = _make_dispatch(
    [
        ("icate", "ic", _pos_measure),
        ("ative", "", _pos_measure),
        ("alize", "al", _pos_measure),
        ("iciti", "ic", _pos_measure),
        ("ical", "ic", _pos_measure),
        ("ful", "", _pos_measure),
        ("ness", "", _pos_measure),
    ]
)


def _nltk_step3(word: str) -> str:
    return _apply_first_d(word, _STEP3_D)


def _gt1_measure(stem_part: str) -> bool:
    return _measure(stem_part) > 1


_STEP4_D = _make_dispatch(
    [
        ("al", "", _gt1_measure),
        ("ance", "", _gt1_measure),
        ("ence", "", _gt1_measure),
        ("er", "", _gt1_measure),
        ("ic", "", _gt1_measure),
        ("able", "", _gt1_measure),
        ("ible", "", _gt1_measure),
        ("ant", "", _gt1_measure),
        ("ement", "", _gt1_measure),
        ("ment", "", _gt1_measure),
        ("ent", "", _gt1_measure),
        ("ion", "", lambda s: _measure(s) > 1 and bool(s) and s[-1] in ("s", "t")),
        ("ou", "", _gt1_measure),
        ("ism", "", _gt1_measure),
        ("ate", "", _gt1_measure),
        ("iti", "", _gt1_measure),
        ("ous", "", _gt1_measure),
        ("ive", "", _gt1_measure),
        ("ize", "", _gt1_measure),
    ]
)


def _nltk_step4(word: str) -> str:
    return _apply_first_d(word, _STEP4_D)


def _stem_nltk(word: str) -> str:
    if word in _NLTK_POOL:
        return _NLTK_POOL[word]
    if len(word) <= 2:
        return word
    w = _nltk_step1a(word)
    w = _nltk_step1b(w)
    w = _nltk_step1c(w)
    w = _nltk_step2(w)
    w = _nltk_step3(w)
    w = _nltk_step4(w)
    # steps 5a/5b are unchanged from the paper
    if w.endswith("e"):
        m = _measure(w[:-1])
        if m > 1 or (m == 1 and not _ends_cvc(w[:-1])):
            w = w[:-1]
    if _measure(w) > 1 and _ends_double_cons(w) and w.endswith("l"):
        w = w[:-1]
    return w


class CachedStemmer:
    """Memoizing stemmer for hot loops (vocabulary is Zipfian, so the cache
    hit rate is high). One instance per tokenize actor (SURVEY.md §2.2 M7)."""

    def __init__(self, mode: str = DEFAULT_MODE) -> None:
        self._cache: dict[str, str] = {}
        self._mode = mode

    def stem(self, word: str) -> str:
        s = self._cache.get(word)
        if s is None:
            s = stem(word, self._mode)
            if len(self._cache) < 2_000_000:
                self._cache[word] = s
        return s
