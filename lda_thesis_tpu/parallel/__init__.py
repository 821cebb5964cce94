"""Distributed execution layer (SURVEY.md C24 — absent in the reference).

The reference is a single-threaded Python loop; this package supplies the
TPU-native scaling axes the north star requires:

* **data axis** — documents sharded across devices; per-shard topic-word
  count replicas merged by ``psum`` of deltas each sweep (AD-LDA,
  Newman et al. '09 — exact within a shard, stale across shards within a
  sweep, exact again after each merge).
* **chains axis** — independent Gibbs chains for posterior pooling and
  Monte-Carlo error bars; pooled estimators average over chains.
"""

from .bootstrap import (
    chains_for,
    initialize_distributed,
    is_distributed,
    make_global_mesh,
)
from .hslda_trainer import DistributedHSLDA
from .trainer import DistributedLabeledLDA
from .sharded import (
    ShardedLDAState,
    make_mesh,
    make_sharded_train_step,
    pooled_phi,
    shard_corpus,
)

__all__ = [
    "DistributedHSLDA",
    "DistributedLabeledLDA",
    "ShardedLDAState",
    "chains_for",
    "initialize_distributed",
    "is_distributed",
    "make_global_mesh",
    "make_mesh",
    "make_sharded_train_step",
    "pooled_phi",
    "shard_corpus",
]
