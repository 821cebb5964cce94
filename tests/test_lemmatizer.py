"""Vendored WordNet-style lemmatiser vs known WordNetLemmatizer outputs.

Fixture values are the outputs of ``nltk.stem.WordNetLemmatizer().lemmatize
(w, pos='v')`` (the reference's exact call, LocalLDA.py:148) for vocabulary
typical of the LocalLDA pipeline; the WordNet corpus itself is not
available in this environment, so the expectations are pinned here.
"""

import pytest

from lda_thesis_tpu.data.lemmatizer import WordNetStyleLemmatizer, lemmatize
from lda_thesis_tpu.data.textproc import prep_doc

VERB_FIXTURE = {
    # irregulars (verb.exc)
    "was": "be", "were": "be", "been": "be", "is": "be",
    "has": "have", "had": "have", "went": "go", "said": "say",
    "made": "make", "running": "run", "took": "take", "found": "find",
    "shown": "show", "written": "write", "held": "hold", "grew": "grow",
    "thought": "think", "built": "build", "chosen": "choose",
    # -s forms
    "takes": "take", "shows": "show", "increases": "increase",
    "watches": "watch", "passes": "pass", "focus": "focus",
    "studies": "study", "applies": "apply",
    # -ed forms
    "looked": "look", "asked": "ask", "noted": "note", "used": "use",
    "based": "base", "stopped": "stop", "agreed": "agree",
    "echoed": "echo", "turned": "turn", "moved": "move",
    "studied": "study", "applied": "apply", "estimated": "estimate",
    # -ing forms
    "making": "make", "looking": "look", "using": "use",
    "hopping": "hop", "hoping": "hope", "seeing": "see",
    "studying": "study", "modeling": "model", "being": "be",
    "creating": "create", "increasing": "increase",
}

NOUN_FIXTURE = {
    "dogs": "dog", "children": "child", "analyses": "analysis",
    "matrices": "matrix", "women": "woman", "series": "series",
    "boxes": "box", "wives": "wife", "classes": "class",
    "economies": "economy", "focus": "focus", "crisis": "crisis",
}


def test_verb_fixture():
    bad = {w: (lemmatize(w, "v"), want)
           for w, want in VERB_FIXTURE.items() if lemmatize(w, "v") != want}
    assert not bad, bad


def test_noun_fixture():
    bad = {w: (lemmatize(w, "n"), want)
           for w, want in NOUN_FIXTURE.items() if lemmatize(w, "n") != want}
    assert not bad, bad


def test_droppin_class_interface():
    lm = WordNetStyleLemmatizer()
    assert lm.lemmatize("running") == "run"
    assert lm.lemmatize("dogs", pos="n") == "dog"
    with pytest.raises(NotImplementedError):
        lemmatize("happy", pos="a")


def test_prep_doc_lemma_default_matches_reference_flags():
    """Reference prep_doc(stem=False, lemma=True) lemmatises with pos='v'
    (LocalLDA.py:137-151); short words and stopwords are dropped first."""
    # 'were'/'using' are stopwords and drop before lemmatisation
    toks = prep_doc("The models were estimated using observed data")
    assert toks == ["model", "estimate", "observe", "data"]
    # stem branch still takes precedence, as in the reference
    toks = prep_doc("The models were estimated", stem=True)
    assert toks == ["model", "estim"]
    # raw branch
    toks = prep_doc("The models were estimated", lemma=False)
    assert toks == ["models", "estimated"]
