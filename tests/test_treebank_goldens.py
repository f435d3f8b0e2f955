"""Reference-stack goldens for the Treebank tokenizer (VERDICT r1 next#5).

The container has no NLTK, so byte-level fixtures cannot be generated here;
these goldens are the PUBLISHED examples from the NLTK
TreebankWordTokenizer documentation (public docstrings) — an external,
non-circular anchor for the from-scratch implementation in
``functions/tokenizer.py`` (the serial oracle shares that module, so the
pytest parity suite alone could not catch a shared divergence; these can).
"""

from searchengine_ray.functions import tokenizer


def test_nltk_docstring_example_muffins():
    s = "Good muffins cost $3.88\nin New York.  Please buy me\ntwo of them.\nThanks."
    assert tokenizer.treebank_tokens(s) == [
        "Good", "muffins", "cost", "$", "3.88", "in", "New", "York.",
        "Please", "buy", "me", "two", "of", "them.", "Thanks", ".",
    ]


def test_nltk_docstring_example_contraction_ll():
    assert tokenizer.treebank_tokens("They'll save and invest more.") == [
        "They", "'ll", "save", "and", "invest", "more", ".",
    ]


def test_nltk_docstring_example_cant():
    assert tokenizer.treebank_tokens("hi, my name can't hello,") == [
        "hi", ",", "my", "name", "ca", "n't", "hello", ",",
    ]


def test_contraction_table():
    assert tokenizer.treebank_tokens("cannot") == ["can", "not"]
    assert tokenizer.treebank_tokens("gonna gotta wanna lemme gimme") == [
        "gon", "na", "got", "ta", "wan", "na", "lem", "me", "gim", "me",
    ]
    assert tokenizer.treebank_tokens("it's we're I'm you'd they've") == [
        "it", "'s", "we", "'re", "I", "'m", "you", "'d", "they", "'ve",
    ]


def test_final_period_only_split_at_text_end():
    # mid-document sentence periods stay attached (whole-doc tokenization)
    toks = tokenizer.treebank_tokens("First sentence. Second sentence.")
    assert "sentence." in toks  # the first one keeps its period
    assert toks[-1] == "."      # only the final one splits


def test_spans_are_verbatim_substrings():
    s = "They'll say: \"we cannot win\" -- twice!"
    for a, b in tokenizer.span_tokenize(s):
        assert s[a:b].strip() == s[a:b]
    # reference call shape: text[start:end].lower().strip()
    assert tokenizer.tokenize(s) == [
        "they", "'ll", "say", ":", '"', "we", "can", "not", "win", '"',
        "--", "twice", "!",
    ]
