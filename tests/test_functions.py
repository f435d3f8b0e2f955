"""Unit tests for the pure functions (no Ray needed)."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from searchengine_ray.functions import hashing, htmlx, porter, tokenizer, varbyte


# ---------------------------------------------------------------- porter

# examples from the published algorithm (Porter 1980)
PORTER_GOLDEN = {
    "caresses": "caress",
    "ponies": "poni",
    "ties": "ti",
    "caress": "caress",
    "cats": "cat",
    "feed": "feed",
    "agreed": "agre",  # agreed -> agree (1b) -> agre (5a: m(agre[:-1]='agr')... )
    "plastered": "plaster",
    "bled": "bled",
    "motoring": "motor",
    "sing": "sing",
    "conflated": "conflat",
    "troubled": "troubl",
    "sized": "size",
    "hopping": "hop",
    "tanned": "tan",
    "falling": "fall",
    "hissing": "hiss",
    "fizzed": "fizz",
    "failing": "fail",
    "filing": "file",
    "happy": "happi",
    "sky": "sky",
    "relational": "relat",
    "conditional": "condit",
    "rational": "ration",
    "valenci": "valenc",
    "digitizer": "digit",
    "operator": "oper",
    "feudalism": "feudal",
    "decisiveness": "decis",
    "hopefulness": "hope",
    "callousness": "callous",
    "formaliti": "formal",
    "sensitiviti": "sensit",
    "sensibiliti": "sensibl",
    "triplicate": "triplic",
    "formative": "form",
    "formalize": "formal",
    "electriciti": "electr",
    "electrical": "electr",
    "hopeful": "hope",
    "goodness": "good",
    "revival": "reviv",
    "allowance": "allow",
    "inference": "infer",
    "airliner": "airlin",
    "gyroscopic": "gyroscop",
    "adjustable": "adjust",
    "defensible": "defens",
    "irritant": "irrit",
    "replacement": "replac",
    "adjustment": "adjust",
    "dependent": "depend",
    "adoption": "adopt",
    "homologou": "homolog",
    "communism": "commun",
    "activate": "activ",
    "angulariti": "angular",
    "homologous": "homolog",
    "effective": "effect",
    "bowdlerize": "bowdler",
    "probate": "probat",
    "rate": "rate",
    "cease": "ceas",
    "controll": "control",
    "roll": "roll",
}


def test_porter_golden():
    bad = {
        w: (porter.stem(w, mode="porter"), want)
        for w, want in PORTER_GOLDEN.items()
        if porter.stem(w, mode="porter") != want
    }
    assert not bad, bad


# Published golden: the NLTK PorterStemmer docstring demo (nltk/stem/porter.py,
# public docs) — input list and expected output verbatim.
NLTK_DEMO_WORDS = (
    "caresses flies dies mules denied died agreed owned humbled sized "
    "meeting stating siezing itemization sensational traditional reference "
    "colonizer plotted"
).split()
NLTK_DEMO_STEMS = (
    "caress fli die mule deni die agre own humbl size meet state siez item "
    "sensat tradit refer colon plot"
).split()

# The documented NLTK_EXTENSIONS deltas from the 1980 paper: the irregular
# forms pool, the 4-letter ies/ied rules, the step-1c y->i condition, and
# the fulli/logi rules.
NLTK_EXTENSION_GOLDEN = {
    # irregular-forms pool
    "sky": "sky", "skies": "sky", "dying": "die", "lying": "lie",
    "tying": "tie", "news": "news", "innings": "inning", "inning": "inning",
    "outings": "outing", "cannings": "canning", "howe": "howe",
    "proceed": "proceed", "exceed": "exceed", "succeed": "succeed",
    # ies/ied 4-letter rules
    "ties": "tie", "dies": "die", "flies": "fli", "spied": "spi",
    "died": "die", "cried": "cri",
    # step-1c (*c and not c) Y -> I
    "happy": "happi", "enjoy": "enjoy", "cry": "cri", "say": "say",
    # logi -> log (the l stays with the stem, so short geo-/theo- stems work)
    "geology": "geolog", "archaeology": "archaeolog",
    "controlled": "control",
}


def test_nltk_demo_golden():
    got = [porter.stem(w, mode="nltk") for w in NLTK_DEMO_WORDS]
    assert got == NLTK_DEMO_STEMS, list(zip(NLTK_DEMO_WORDS, got, NLTK_DEMO_STEMS))


def test_nltk_extension_golden():
    bad = {
        w: (porter.stem(w, mode="nltk"), want)
        for w, want in NLTK_EXTENSION_GOLDEN.items()
        if porter.stem(w, mode="nltk") != want
    }
    assert not bad, bad


def test_modes_differ_where_documented():
    # the 1980 paper stems these differently — proves the two modes are
    # really two implementations, not one behind a flag
    assert porter.stem("ties", mode="porter") == "ti"
    assert porter.stem("say", mode="porter") == "sai"
    assert porter.stem("cry", mode="porter") == "cry"
    assert porter.stem("skies", mode="porter") == "ski"
    assert porter.stem("dying", mode="porter") == "dy"


def test_default_mode_is_nltk():
    # the reference stems with NLTK's default NLTK_EXTENSIONS mode
    assert porter.DEFAULT_MODE == "nltk"
    assert porter.stem("ties") == "tie"
    assert porter.CachedStemmer().stem("dying") == "die"
    assert porter.CachedStemmer(mode="porter").stem("dying") == "dy"


def test_porter_short_words_unchanged():
    assert porter.stem("is") == "is"
    assert porter.stem("a") == "a"
    assert porter.stem("is", mode="porter") == "is"


@given(st.text(alphabet=st.characters(min_codepoint=97, max_codepoint=122), max_size=30))
@settings(max_examples=300, deadline=None)
def test_porter_never_crashes_and_shrinks(w):
    s = porter.stem(w)
    assert isinstance(s, str)
    assert len(s) <= max(len(w), 1)


def test_cached_stemmer_matches():
    cs = porter.CachedStemmer()
    for w in PORTER_GOLDEN:
        assert cs.stem(w) == porter.stem(w)
        assert cs.stem(w) == porter.stem(w)  # cached path


# ---------------------------------------------------------------- tokenizer


def test_tokenize_basic():
    assert tokenizer.tokenize("Hello, World!") == ["hello", ",", "world", "!"]


def test_tokenize_code_query():
    # TEST.txt query 15: print("Hello world!")
    assert tokenizer.tokenize('print("Hello world!")') == [
        "print", "(", '"', "hello", "world", "!", '"', ")",
    ]


def test_tokenize_treebank_contractions_and_numbers():
    # Treebank splits contractions; decimals stay single tokens
    assert tokenizer.tokenize("don't stop 3.14") == ["do", "n't", "stop", "3.14"]


def test_simple_tokens_matches_duckdb():
    import duckdb

    texts = ["Hello, World 42!", "  a--b  ", "", "ÜBER über", "x"]
    for t in texts:
        got = tokenizer.simple_tokens(t)
        want = duckdb.sql(
            "select list_filter(regexp_split_to_array(lower(?), '[^a-z0-9]+'), x -> x <> '')",
            params=[t],
        ).fetchone()[0]
        assert got == want, (t, got, want)


def test_word_count():
    assert tokenizer.word_count(["a", "b", "a"]) == {"a": 2, "b": 1}


def test_stopwords():
    assert tokenizer.is_stopword("the")
    assert tokenizer.is_stopword("aren't")
    assert not tokenizer.is_stopword("ray")


# ---------------------------------------------------------------- hashing


def _crc32_from_scratch(data: bytes) -> int:
    """Table-driven CRC-32 mirroring the reference algorithm shape
    (lib/duphash.py:9-39) to prove zlib.crc32 equality."""
    poly = 0xEDB88320
    table = []
    for i in range(256):
        v = i
        for _ in range(8):
            v = (v >> 1) ^ poly if v & 1 else v >> 1
        table.append(v)
    crc = 0xFFFFFFFF
    for b in data:
        crc = (crc >> 8) ^ table[(crc ^ b) & 0xFF]
    return crc ^ 0xFFFFFFFF


@given(st.binary(max_size=200))
@settings(max_examples=200, deadline=None)
def test_crc32_equals_from_scratch(data):
    assert hashing.crc32(data) == _crc32_from_scratch(data)


def test_crc64_known_vector():
    # CRC-64/XZ check value for "123456789" (public test vector)
    assert hashing.crc64(b"123456789") == 0x995DC9BBDF1939FA


def test_exact_hash_layout():
    h = hashing.exact_hash("abc")
    assert len(h) == 8
    assert int.from_bytes(h[4:], "little") == 3
    assert hashing.exact_hash("abc") == hashing.exact_hash(b"abc")
    assert hashing.exact_hash("abc") != hashing.exact_hash("abd")


def _simhash_reference_style(wordcnts: dict[str, int]) -> int:
    """Literal transcription of the simhash spec (lib/duphash.py:108-134)
    using our crc64, producing an int from the bit string."""
    hash_size = 32
    v = [0] * hash_size
    for word, cnt in wordcnts.items():
        word_hash = hashing.crc64(word.encode("utf-8")) % (2**hash_size)
        binary_hash = format(word_hash, f"0{hash_size}b")
        for i in range(hash_size):
            bit_value = 1 if binary_hash[i] == "1" else -1
            v[i] += bit_value * cnt
    fingerprint = "".join("1" if x > 0 else "0" for x in v)
    return int(fingerprint, 2)


@given(
    st.dictionaries(
        st.text(alphabet="abcdefg", min_size=1, max_size=8),
        st.integers(min_value=1, max_value=9),
        max_size=12,
    )
)
@settings(max_examples=100, deadline=None)
def test_simhash_matches_spec(wc):
    assert hashing.simhash(wc) == _simhash_reference_style(wc)


def test_hamming():
    assert hashing.hamming32(0b1010, 0b0011) == 2
    arr = np.array([0b1010, 0b0011, 0xFFFFFFFF], dtype=np.uint32)
    assert hashing.hamming32_vec(arr, 0b1010).tolist() == [0, 2, 30]


# ---------------------------------------------------------------- varbyte


@given(st.lists(st.integers(min_value=0, max_value=2**62), max_size=100))
@settings(max_examples=200, deadline=None)
def test_varbyte_roundtrip(vals):
    arr = np.array(vals, dtype=np.uint64)
    assert varbyte.vb_decode(varbyte.vb_encode(arr)).tolist() == vals


@given(
    st.lists(st.integers(min_value=1, max_value=2**40), min_size=0, max_size=200, unique=True)
)
@settings(max_examples=100, deadline=None)
def test_postings_roundtrip(ids):
    ids = sorted(ids)
    tfs = [(i % 7) + 1 for i in range(len(ids))]
    dvb, tvb = varbyte.encode_postings(
        np.array(ids, dtype=np.uint64), np.array(tfs, dtype=np.uint64)
    )
    d, t = varbyte.decode_postings(dvb, tvb)
    assert d.tolist() == ids
    assert t.tolist() == tfs


def test_block_max():
    ids = np.arange(1, 301)
    scores = np.linspace(0, 1, 300).astype(np.float32)
    last, bounds = varbyte.block_max(ids, scores, 128)
    assert last.tolist() == [128, 256, 300]
    assert len(bounds) == 3
    assert bounds[2] == pytest.approx(1.0)


# ---------------------------------------------------------------- htmlx


def test_extract_text_and_tags():
    html = (
        "<html><head><title>My Title</title></head><body>"
        "<h1>Big Heading</h1><p>plain text with <b>bold words</b> here</p>"
        "</body></html>"
    )
    text, tag_text, links = htmlx.extract(html, "http://x.com/a")
    assert text == "My TitleBig Headingplain text with bold words here"
    assert tag_text["title"] == "My Title"
    assert tag_text["h1"] == "Big Heading"
    assert tag_text["b"] == "bold words"
    assert links == []


def test_extract_nested_important_attribution():
    # a <b> inside an <h1>: text attributed to h1 only (decompose semantics,
    # makeindex.py:168-174)
    html = "<h1>head <b>inner</b></h1><b>outer</b>"
    _, tag_text, _ = htmlx.extract(html, "http://x.com/")
    assert tag_text["h1"] == "head inner"
    assert tag_text["b"] == "outer"


def test_extract_links():
    html = (
        '<body><a href="/rel">r</a>'
        '<a href="http://other.com/p#frag">o</a>'
        '<a href="/rel">dup</a>'
        '<h1><a href="/inside-important">lost</a></h1></body>'
    )
    _, _, links = htmlx.extract(html, "http://x.com/base/page")
    assert links == ["http://x.com/rel", "http://other.com/p"]


def test_extract_includes_script_text():
    # bs4 get_text() includes script/style contents (makeindex.py:155)
    text, _, _ = htmlx.extract("<script>var x=1;</script><p>hi</p>", "http://x/")
    assert text == "var x=1;hi"


def test_defrag():
    assert htmlx.defrag("http://x.com/a#b") == "http://x.com/a"
    assert htmlx.defrag("http://x.com/a") == "http://x.com/a"


def test_simhash_batch_matches_scalar():
    from searchengine_ray.functions import hashing

    docs = [
        {},
        {"the": 3, "quick": 1, "fox": 2},
        {"lorem": 1},
        {},
        {"the": 1, "fox": 1, "zebra": 5, "qq": 1},
        {},
    ]
    batch = hashing.simhash_batch(docs)
    for wc, got in zip(docs, batch):
        assert int(got) == hashing.simhash(wc)


# ---- htmlx fast-path equivalence -------------------------------------

def _full_parse(html):
    from searchengine_ray.functions.htmlx import _Extractor

    p = _Extractor()
    p.feed(html)
    p.close()
    return (
        "".join(p.text_parts),
        {t: "".join(v) for t, v in p.tag_texts.items() if v},
        p.hrefs,
    )


def _dispatch_parse(html):
    """What extract() computes before link resolution (fast or fallback)."""
    from searchengine_ray.functions.htmlx import (
        _Extractor,
        _FALLBACK_RE,
        _NeedsFullParser,
        _fast_feed,
    )

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
    return (
        "".join(p.text_parts),
        {t: "".join(v) for t, v in p.tag_texts.items() if v},
        p.hrefs,
    )


TRICKY_HTML = [
    "<html><title>T</title><body><h1>H</h1><p>hello &amp; bye</p></body></html>",
    "<B>Upper</B> plain <I>x</I>",
    '<a href="x">l</a><a href=\'y\'>m</a><a href=z>n</a>',
    "<a href>n</a><a>m</a>",
    '<a id="1" href="first" href="second">t</a>',
    '<a title="href=evil" href="real">t</a>',
    '<a title="x href=evil2 y" href="real2">t</a>',
    '<a href="a&amp;b">e</a> &lt;tag&gt; &#65;',
    "<b/>selfclose<a href=x/>v</a>",
    '<a href="x"/>q',
    "a < b and c > d",
    '<a href="unterminated',
    '<a href="x>y">trap</a>',
    "<b@x>weird</b@x>",
    "<h1><b>nested</b> important <a href='inlink'>L</a></h1><a href='out'>O</a>",
    "<script>var x = '<b>not text</b>';</script>after",
    "<style>p { color: red }</style>s",
    "<!-- <b>comment</b> --><p>real</p>",
    "<!DOCTYPE html><p>x</p>",
    "<?php echo 1 ?><p>y</p>",
    "<p>multi\nline\ttext</p>",
    "<A HREF='CAPS'>c</A>",
    "<b><b>double</b>once</b>",
    "</b>stray close<b>open only",
    "<mark>m1</mark><strong>s</strong><h4>h</h4>",
    "<p attr=''>empty quotes</p>",
    "<a href=''>empty href</a>",
    "text &notanentity; more",
    "<a href=\"x\" >spaced</a >",
]


def test_fast_path_matches_htmlparser():
    for h in TRICKY_HTML:
        assert _dispatch_parse(h) == _full_parse(h), h


def test_fast_path_matches_htmlparser_fuzz():
    import random

    rng = random.Random(99)
    pieces = [
        "<b>", "</b>", "<h1>", "</h1>", "<a href='u'>", "<a href=v>",
        "</a>", "text ", "&amp;", "&#65;", "'", '"', "<", ">", "/", "=",
        " ", "x", "<p>", "</p>", "<title>", "</title>", "<mark>", "&",
        "<b/>", "<a href=", "'>", "\n",
    ]
    for _ in range(400):
        h = "".join(rng.choice(pieces) for _ in range(rng.randint(1, 30)))
        assert _dispatch_parse(h) == _full_parse(h), repr(h)
