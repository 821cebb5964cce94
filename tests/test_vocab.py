"""Dictionary semantics tests (gensim-compatible)."""

from lda_thesis_tpu.data.vocab import Dictionary, prune_dict


DOCS = [
    ["b", "a", "b", "c"],
    ["a", "d"],
    ["a", "b", "e"],
    ["f", "a"],
]


def test_id_assignment_first_appearance():
    d = Dictionary(DOCS)
    assert d.token2id["b"] == 0
    assert d.token2id["a"] == 1
    assert d.token2id["c"] == 2
    assert d.token2id["d"] == 3


def test_doc2bow_sorted_with_freqs():
    d = Dictionary(DOCS)
    bow = d.doc2bow(["b", "a", "b", "zzz"])
    assert bow == [(0, 2), (1, 1)]


def test_dfs():
    d = Dictionary(DOCS)
    assert d.dfs[d.token2id["a"]] == 4
    assert d.dfs[d.token2id["b"]] == 2
    assert d.dfs[d.token2id["c"]] == 1


def test_filter_extremes_bounds_and_compactify():
    d = Dictionary(DOCS)
    # drop df < 2 and df > 0.75*4 = 3  -> keeps only 'b' (df=2); 'a' df=4 dropped
    d.filter_extremes(no_below=2, no_above=0.75)
    assert set(d.token2id) == {"b"}
    assert d.token2id["b"] == 0
    assert d.dfs[0] == 2


def test_filter_extremes_float_no_below():
    # reference L-LDA passes no_below as float (LabeledLDA.py:283-284)
    d = Dictionary(DOCS)
    d.filter_extremes(no_below=1.5, no_above=1.0)
    assert "c" not in d.token2id and "a" in d.token2id


def test_compactify_preserves_old_id_order():
    d = Dictionary(DOCS)
    d.filter_extremes(no_below=2, no_above=1.0)  # keeps a(1), b(0)
    assert d.token2id["b"] == 0 and d.token2id["a"] == 1


def test_prune_dict_fractional_lower():
    dicti = prune_dict(DOCS, lower=0.5, upper=1.0)  # df >= 2
    assert set(dicti.token2id) == {"a", "b"}


def test_values_in_id_order():
    d = Dictionary(DOCS)
    assert d.values()[:3] == ["b", "a", "c"]
