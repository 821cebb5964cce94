"""Corpus loader / JEL parsing / split tests."""

import numpy as np
import pytest

from lda_thesis_tpu.data.corpus import load_corpus, partition_label, split_data
from lda_thesis_tpu.data.encode import (
    binarize_labels,
    build_labelmap,
    encode_bow_types,
    encode_corpus,
    encode_instances,
)
from lda_thesis_tpu.data.vocab import Dictionary

CSV = """id1,"Monetary policy and inflation targeting in open economies",E52 F41
id2,"Labor markets and wage rigidity",J31
id3,"Econometric estimation of demand systems; consumer theory",C51 D12
"""


@pytest.fixture
def csv_file(tmp_path):
    p = tmp_path / "corpus.csv"
    p.write_text(CSV)
    return str(p)


def test_partition_label():
    assert partition_label("E52", 3) == ["E", "E5", "E52"]
    assert partition_label("E52", 2) == ["E", "E5"]


def test_load_truncate_depth2(csv_file):
    c = load_corpus(csv_file, d=2, mode="truncate")
    assert len(c) == 3
    assert sorted(c.labs[0]) == ["E5", "F4"]
    # single-code row goes through the short branch (len <= 3)
    assert c.labs[1] == ["J3"]
    assert "E5" in c.labelset and "J3" in c.labelset


def test_load_prefix_depth3(csv_file):
    c = load_corpus(csv_file, d=3, mode="prefix")
    assert sorted(c.labs[1]) == ["J", "J3", "J31"]
    assert set(["E", "E5", "E52", "F", "F4", "F41"]).issubset(set(c.labs[0]))


def test_docs_are_tokenized_and_stemmed(csv_file):
    c = load_corpus(csv_file, d=2)
    assert "monetari" in c.docs[0]  # 'monetary' stemmed
    assert "polici" in c.docs[0]


def test_split_shapes(csv_file):
    c = load_corpus(csv_file, d=1)
    train, test = split_data(c, train_frac=0.67, shuffle=True, seed=0)
    assert len(train) == 2 and len(test) == 1
    train2, test2 = split_data(c, shuffle=False)
    assert train2.docs[0] == c.docs[0]


def test_build_labelmap_root_first():
    lm = build_labelmap(["E", "J"])
    assert lm == {"root": 0, "E": 1, "J": 2}
    lm2 = build_labelmap(["E"], root="")
    assert lm2 == {"": 0, "E": 1}


def test_binarize_labels():
    lm = build_labelmap(["E", "J"])
    m = binarize_labels([["E"], ["J", "E"], []], lm)
    assert m.tolist() == [[1, 1, 0], [1, 1, 1], [1, 0, 0]]


def test_encode_bow_types_padding():
    tok_v, tok_f = encode_bow_types([[(3, 2), (5, 1)], [(1, 4)]], pad_multiple=4)
    assert tok_v.shape == (2, 4)
    assert tok_f[0].tolist() == [2, 1, 0, 0]
    assert tok_v[0].tolist() == [3, 5, 0, 0]
    assert tok_f[1].tolist() == [4, 0, 0, 0]


def test_encode_instances():
    tok_v, mask = encode_instances([[7, 7, 2], [4]], pad_multiple=4)
    assert tok_v[0].tolist() == [7, 7, 2, 0]
    assert mask.sum() == 4


def test_encode_corpus_end_to_end(csv_file):
    c = load_corpus(csv_file, d=1, mode="truncate")
    dicti = Dictionary(c.docs)
    enc = encode_corpus(c.docs, c.labs, c.labelset, dicti)
    assert enc.D == 3
    assert enc.K == len(c.labelset) + 1  # + root
    assert enc.n_tokens == sum(len(d) for d in c.docs)
    assert (enc.labs[:, 0] == 1).all()
