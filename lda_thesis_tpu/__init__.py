"""lda_thesis_tpu — a TPU-native probabilistic inference framework for
supervised/constrained LDA model families (Labeled LDA, CascadeLDA, HSLDA,
LocalLDA), built on JAX/XLA/Pallas/pjit.

Capability parity target: KenHBS/LDA_thesis (see SURVEY.md). The reference is a
single-threaded per-token NumPy Gibbs sampler; this framework re-designs the
same models TPU-first:

- corpora are flattened into dense padded token tensors (no Python loops),
- the collapsed-Gibbs sweep is a position-slice parallel kernel (all documents
  resample token slot n simultaneously; per-document n_dk updates are exact,
  topic-word counts are merged synchronously — the AD-LDA family of
  approximations, see PAPERS.md),
- categorical draws use masked Gumbel-max in log-space (no renormalization
  hacks like LabeledLDA.py:170-171 in the reference),
- many chains / sharded documents run SPMD over a `jax.sharding.Mesh` with
  psum count merges over ICI.
"""

__version__ = "0.1.0"

from lda_thesis_tpu.data.corpus import load_corpus, split_data
from lda_thesis_tpu.data.vocab import Dictionary, prune_dict
from lda_thesis_tpu.data.encode import encode_corpus, EncodedCorpus

__all__ = [
    "load_corpus",
    "split_data",
    "Dictionary",
    "prune_dict",
    "encode_corpus",
    "EncodedCorpus",
]
