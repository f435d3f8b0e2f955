"""M3 extractor goldens derived from PUBLISHED parser behavior.

bs4/lxml are not installable in this environment (SURVEY §8 addendum), so
the byte-identity target ``BeautifulSoup(content, 'lxml').get_text()``
(``/root/reference/makeindex.py:151-156``) is anchored the same way M6/M7
were closed: fixtures whose expected output follows from *documented*
public rules, each test naming its rule —

- the WHATWG HTML Standard tokenizer (§13.2.5): character-reference
  processing incl. the legacy no-semicolon list and the spec's own
  ``&notit;``/``&notin;`` examples, script/style raw-text states (no
  charref, no tag-open), bogus-comment handling of ``<![CDATA[`` and
  ``<?`` in HTML content, ``<`` before a non-letter emitted as text,
  quoted ``>`` inside attribute values, void elements;
- the Beautiful Soup documentation: ``get_text()`` concatenates every
  string under the tree (default separator ``""``), entities arrive
  already converted to Unicode, and (since 4.9.0, per its CHANGELOG)
  comments / processing instructions / doctypes are NOT part of
  ``get_text()`` output.

Residual divergence classes NOT covered by these rules (named per VERDICT
r3 next #4, documented in SURVEY §8): libxml2's element-level error
recovery on grossly malformed trees (e.g. where it drops or relocates
whole subtrees rather than just auto-closing), and input-encoding
sniffing (the rebuild decodes utf-8/replace upstream; bs4's UnicodeDammit
may pick a different codec for non-utf-8 bytes).  Both affect only
invalid documents / non-utf-8 corpora.
"""

from searchengine_ray.functions import htmlx

BASE = "http://host.example/dir/page.html"


def text_of(html: str) -> str:
    return htmlx.extract(html, BASE)[0]


def links_of(html: str) -> list[str]:
    return htmlx.extract(html, BASE)[2]


# ---- character references (HTML std §13.2.5.72-73; bs4 docs: "Beautiful
# Soup converts HTML entities to Unicode characters") -----------------------


def test_named_entities_decoded():
    assert text_of("<p>Sacr&eacute; bleu &amp; &quot;fish&quot;</p>") == (
        'Sacré bleu & "fish"'
    )


def test_numeric_charrefs_decoded():
    # decimal, hex, astral-plane hex
    assert text_of("<p>&#65;&#x42;&#x1F4A9;</p>") == "AB\U0001F4A9"


def test_legacy_no_semicolon_spec_examples():
    # the HTML Standard's own examples for the ambiguous-ampersand /
    # legacy named-reference rules: "I'm &notit;" renders "I'm ¬it;",
    # "I'm &notin;" renders "I'm ∉"
    assert text_of("<p>I'm &notit; I tell you</p>") == "I'm ¬it; I tell you"
    assert text_of("<p>I'm &notin; I tell you</p>") == "I'm ∉ I tell you"
    # &amp without the semicolon is on the legacy list
    assert text_of("<p>fish &amp chips</p>") == "fish & chips"


def test_unknown_entity_kept_literal():
    # not a named reference and no legacy prefix -> literal text
    assert text_of("<p>&nosuchentity; stays</p>") == "&nosuchentity; stays"


# ---- raw-text elements (HTML std §13.2.5.4 script-data state: no charref
# processing, nothing but "</script" ends it; bs4 docs: get_text() returns
# ALL the text, which includes script/style strings) ------------------------


def test_script_text_included_raw():
    html = '<p>A</p><script>if (a < b && c) { x("&amp;"); }</script><p>B</p>'
    assert text_of(html) == 'Aif (a < b && c) { x("&amp;"); }B'


def test_style_text_included_raw():
    assert (
        text_of("<style>a>b { content: '&amp;'; }</style>tail")
        == "a>b { content: '&amp;'; }tail"
    )


# ---- invisible nodes (bs4 4.9.0 CHANGELOG: comments, processing
# instructions and doctypes are no longer part of get_text(); HTML std
# §13.2.5.42: "<!" not starting a comment/DOCTYPE/CDATA in HTML content is
# a bogus comment — CDATA sections exist only in foreign content) -----------


def test_comment_excluded():
    assert text_of("x<!-- hidden text -->y") == "xy"


def test_doctype_excluded():
    assert text_of("<!DOCTYPE html><p>z</p>") == "z"


def test_processing_instruction_excluded():
    assert text_of("<?php echo 'no' ?>w") == "w"


def test_cdata_in_html_content_is_bogus_comment():
    assert text_of("<![CDATA[ invisible ]]>t") == "t"


# ---- tokenizer text rules --------------------------------------------------


def test_lt_before_non_letter_is_text():
    # HTML std §13.2.5.6 tag-open state: anything but an ASCII letter,
    # "/", "!" or "?" after "<" emits the "<" as character data
    assert text_of("<p>3 < 4 and 5<6</p>") == "3 < 4 and 5<6"


def test_quoted_gt_inside_attribute_value():
    # §13.2.5.36 attribute-value-(double-quoted) state: ">" inside quotes
    # does not close the tag
    html = '<a href="/x?a>b">t</a>q'
    assert text_of(html) == "tq"
    assert links_of(html) == ["http://host.example/x?a>b"]


def test_attribute_charrefs_decoded_before_join():
    html = '<a href="/p?x=1&amp;y=2">l</a>'
    assert links_of(html) == ["http://host.example/p?x=1&y=2"]


def test_void_elements_produce_no_text():
    assert text_of("a<br>b<img src=x>c<hr/>d") == "abcd"


# ---- tree-recovery cases where every HTML parser (libxml2 recovery,
# html5lib, html.parser) emits the same character data ----------------------


def test_unclosed_tags_at_eof_keep_text():
    assert text_of("<div><b>bold text") == "bold text"


def test_implied_paragraph_close():
    assert text_of("<p>one<p>two</p>") == "onetwo"


def test_misnested_formatting_keeps_document_order():
    # recovery reshapes the TREE; the character data and its order are
    # identical across parsers, and get_text() is order-concatenation
    assert text_of("<b>x<i>y</b>z</i>w") == "xyzw"


def test_get_text_is_plain_concatenation():
    # bs4 docs: get_text() default separator is "" — whitespace comes only
    # from the document's own text nodes
    assert text_of("<ul><li> a </li><li> b </li></ul>") == " a  b "
    assert text_of("<head><title>T</title></head>body") == "Tbody"


# ---- both extractor paths agree on every golden ---------------------------


def test_goldens_identical_on_full_parser_path():
    """The fast scanner and the stdlib HTMLParser path must agree on every
    fixture above (the fast path falls back on <script/<style/<!/<? so
    several goldens exercise the full parser already; this forces both)."""
    fixtures = [
        "<p>Sacr&eacute; bleu &amp; &quot;fish&quot;</p>",
        "<p>&#65;&#x42;&#x1F4A9;</p>",
        "<p>I'm &notit; I tell you</p>",
        "<p>fish &amp chips</p>",
        "<p>3 < 4 and 5<6</p>",
        '<a href="/x?a>b">t</a>q',
        "a<br>b<img src=x>c<hr/>d",
        "<div><b>bold text",
        "<p>one<p>two</p>",
        "<b>x<i>y</b>z</i>w",
        "<ul><li> a </li><li> b </li></ul>",
    ]
    for html in fixtures:
        full = htmlx._Extractor()
        full.feed(html)
        full.close()
        assert htmlx.extract(html, BASE)[0] == "".join(full.text_parts), html
