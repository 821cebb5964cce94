"""Host-side corpus layer: loading, preprocessing, vocabulary, dense encoding."""

from .corpus import RawCorpus, load_corpus, partition_label, split_data
from .encode import (
    EncodedCorpus,
    binarize_labels,
    build_labelmap,
    encode_bow_types,
    encode_corpus,
    encode_instances,
)
from .porter import PorterStemmer, stem, stem_text
from .stopwords import STOPWORDS
from .textproc import (
    prep_doc,
    prep_docs,
    preprocess_documents,
    preprocess_string,
    split_sentences,
)
from .vocab import Dictionary, prune_dict

__all__ = [
    "RawCorpus",
    "load_corpus",
    "partition_label",
    "split_data",
    "EncodedCorpus",
    "binarize_labels",
    "build_labelmap",
    "encode_bow_types",
    "encode_corpus",
    "encode_instances",
    "PorterStemmer",
    "stem",
    "stem_text",
    "STOPWORDS",
    "prep_doc",
    "prep_docs",
    "preprocess_documents",
    "preprocess_string",
    "split_sentences",
    "Dictionary",
    "prune_dict",
]
