"""Parity tests: native C++ preprocessing vs the pure-Python pipeline.

The native path (runtime/textproc.cpp via data/native.py) must produce
token-for-token identical output — the vocabulary and count tensors depend
on it.  Tested on synthetic edge cases AND a slice of the real corpus.
"""

import os
import time

import pytest

from lda_thesis_tpu.data.native import native_available, preprocess_documents_native
from lda_thesis_tpu.data.stopwords import STOPWORDS
from lda_thesis_tpu.data.textproc import preprocess_string

needs_native = pytest.mark.skipif(
    not native_available(), reason="native library unavailable (no g++?)"
)

EDGE_DOCS = [
    "",
    "   ",
    "The CAT sat!! On the <b>mat</b> with 123 numbers42x and running quickly.",
    "a bb ccc dddd--eeee ffff's ggg?hhh",
    "<unclosed tag and > stray bracket <> <<x>>",
    "relational conditional rational optimization nationalization",
    "flies dies cries agreed feed bleed seed",
    "hopping hoping controlled rolled falling fizzing buzzing",
    "happy sky money monkey play saying",
    "connect connected connecting connection connections",
    "punct,,,uation;;;everywhere...test1234test",
    "stopwords the a an is are was were be been",
    "singleS ss sses classes caresses ponies ties",
    "CAPS MIXED CaSe WoRdS",
    "tabs\tand\nnewlines\r\nand  multiple   spaces",
]


@needs_native
def test_edge_case_parity():
    got = preprocess_documents_native(EDGE_DOCS, STOPWORDS)
    want = [preprocess_string(d, STOPWORDS) for d in EDGE_DOCS]
    for g, w, d in zip(got, want, EDGE_DOCS):
        assert g == w, f"mismatch for {d!r}: native={g} python={w}"


@needs_native
@pytest.mark.skipif(
    not os.path.exists("/root/reference/abstracts_data.csv"),
    reason="real corpus not available",
)
def test_real_corpus_parity_and_speed():
    import csv
    import sys

    csv.field_size_limit(min(sys.maxsize, 2**31 - 1))
    with open("/root/reference/abstracts_data.csv", newline="") as f:
        docs = [row[1] for row in csv.reader(f)]

    t0 = time.perf_counter()
    got = preprocess_documents_native(docs, STOPWORDS)
    t_native = time.perf_counter() - t0

    t0 = time.perf_counter()
    want = [preprocess_string(d, STOPWORDS) for d in docs]
    t_python = time.perf_counter() - t0

    assert got == want  # full-corpus token-for-token parity
    # Speed is measured properly in benchmarks/; under parallel test load the
    # ratio is noisy, so keep a modest margin (native is ~4-6x in isolation) —
    # enough to catch a large native-path regression without flaking.
    assert t_native < t_python / 1.5, (t_native, t_python)
