"""User-facing distributed Labeled-LDA trainer.

Same constructor/API surface as :class:`models.labeled_lda.LabeledLDA`
(docs, labs, labelset, dicti, alpha, beta) plus the mesh shape — documents
sharded over the ``data`` axis with AD-LDA ``psum`` merges, independent
chains over the ``chains`` axis, pooled posterior estimators, and the same
``run_training`` / ``run_test`` / ``get_phi`` methods, so single-chip code
ports by changing one class name.

    mesh = make_mesh(n_data=4, n_chains=2)       # 8 devices
    model = DistributedLabeledLDA(docs, labs, labelset, dicti,
                                  alpha=0.1, beta=0.01, mesh=mesh, n_chains=4)
    model.run_training(150, 25)
    theta = model.run_test(test_docs, 150, 25)   # pooled-phi fold-in
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from ..data.encode import (
    binarize_labels,
    build_labelmap,
    compact_labels,
    encode_bow_types,
)
from ..models.labeled_lda import _test_loop
from ._util import check_merge_block as _check_merge_block
from ._util import dispatch_chunks as _dispatch_chunks
from .fused_sharded import (
    FusedShardedState,
    init_fused_sharded,
    make_fused_train_loop,
    shard_fused_corpus,
)
from .sharded import (
    init_sharded_state,
    make_mesh,
    make_sharded_train_step,
    shard_corpus,
)

__all__ = ["DistributedLabeledLDA"]


class DistributedLabeledLDA:
    """Labeled LDA over a ``(chains, data)`` device mesh."""

    def __init__(
        self,
        docs: Sequence[Sequence[str]],
        labs: Sequence[Sequence[str]],
        labelset: Sequence[str],
        dicti,
        alpha: float,
        beta: float,
        mesh: Optional[Mesh] = None,
        n_chains: Optional[int] = None,
        seed: int = 0,
        k_pad: int = 128,
        sweep: str = "auto",
        merge_every: int = 25,
        table_shard: str = "replicated",
        n_buckets: int = 1,
    ):
        self.alpha = float(alpha)
        self.beta = float(beta)
        self.dicti = dicti
        self.labelmap = build_labelmap(labelset)
        self.K = len(self.labelmap)
        self.V = len(dicti)
        self.D = len(docs)
        self.v_to_w = dicti.id2token

        self.mesh = mesh if mesh is not None else make_mesh(n_chains=1)
        self.n_chains = int(
            n_chains if n_chains is not None else self.mesh.shape["chains"]
        )
        if self.n_chains % self.mesh.shape["chains"]:
            raise ValueError("n_chains must be a multiple of the chains mesh axis")

        bows = [dicti.doc2bow(doc) for doc in docs]
        tok_v, tok_f = encode_bow_types(bows)
        lab_mask = binarize_labels(labs, self.labelmap)
        # int16 block-gather gate (ops/gibbs_fused.gather_cv(table_i16=)):
        # every n_vk entry is bounded by its word's corpus frequency
        freq = np.bincount(np.asarray(tok_v).reshape(-1),
                           weights=np.asarray(tok_f).reshape(-1))
        self._table_i16 = bool(freq.size and freq.max() < 32768)
        self.Kp = ((self.K + k_pad - 1) // k_pad) * k_pad
        lab_mask = np.pad(lab_mask, ((0, 0), (0, self.Kp - self.K)))
        self.topic_mask = jnp.asarray((np.arange(self.Kp) < self.K).astype(np.float32))
        self.n_tokens = int(tok_f.sum())

        # sweep kernel: "fused" (default) = whole-sweep merge-block Pallas
        # sampler per (chain, shard) — parallel/fused_sharded.py; "dense" =
        # the exact per-position AD-LDA step (parallel/sharded.py).
        if sweep == "auto":
            sweep = "fused"
        self.sweep = sweep
        self.merge_every = max(int(merge_every), 1)
        # n_buckets > 1 (opt-in): per-bucket sharded fused layout
        # (parallel/fused_sharded_buckets.py) — cuts the padded (U, D)
        # area like the single-chip default does; the bucket layout is
        # part of the draw stream, so the unbucketed layout stays the
        # distributed default and its checkpoints stay valid.
        self.n_buckets = max(int(n_buckets), 1)
        if self.n_buckets > 1 and (sweep != "fused"
                                   or table_shard != "replicated"):
            raise ValueError("n_buckets > 1 requires sweep='fused' and "
                             "table_shard='replicated'")

        # table_shard="vocab": shard the topic-word table's V axis over the
        # data mesh axis (parallel/vocab_sharded.py) — per-device persistent
        # state drops S-fold for large V·K.  Composes with chains (round-5
        # VERDICT item 4): n_chains > 1 runs independent chains over the
        # ``chains`` axis, each with its OWN vocab-sharded table
        # (per-device table memory = C_local · V/S · K).
        if table_shard not in ("replicated", "vocab"):
            raise ValueError(f"unknown table_shard {table_shard!r}")
        self.table_shard = table_shard
        self._vocab_chains = (table_shard == "vocab"
                              and (self.n_chains > 1
                                   or self.mesh.shape["chains"] > 1))

        self._key = jax.random.PRNGKey(seed)
        self._key, k0 = jax.random.split(self._key)
        if table_shard == "vocab":
            if sweep not in ("auto", "fused"):
                raise ValueError("table_shard='vocab' uses the fused sampler")
            self.sweep = "fused"
            lab_ids, lab_valid = compact_labels(lab_mask)
            self.A = lab_ids.shape[1]
            if self._vocab_chains:
                from .vocab_sharded import init_vocab_chains

                # same corpus layout + init key scheme as the replicated
                # chains path — the chains×vocab run draws the identical
                # chains (integer counts: psum_scatter == psum bitwise)
                (self._tok_v_t, self._tok_f_t, self._lab_ids,
                 self._lab_valid_t) = shard_fused_corpus(
                    self.mesh, tok_v, tok_f, lab_ids, lab_valid)
                self.state = init_vocab_chains(
                    k0, self.mesh,
                    (self._tok_v_t, self._tok_f_t, self._lab_ids,
                     self._lab_valid_t),
                    self.V, self.Kp, self.n_chains)
            else:
                from .vocab_sharded import (
                    init_vocab_sharded_train,
                    shard_vocab_corpus,
                )

                (self._tok_v_t, self._tok_f_t, self._lab_ids,
                 self._lab_valid_t) = shard_vocab_corpus(
                    self.mesh, tok_v.T, tok_f.T.astype(np.float32), lab_ids,
                    lab_valid.T)
                self.state = init_vocab_sharded_train(
                    k0, self.mesh, tok_v, tok_f, lab_ids, lab_valid,
                    self.V, self.Kp)
            self._loop = None
            self._master_key = jax.random.fold_in(self._key, 0x5eed)
            self._sweeps_done = 0
            return
        if sweep == "fused" and self.n_buckets > 1:
            from ..data.buckets import bucket_encode
            from .fused_sharded_buckets import (
                init_bucketed_sharded,
                shard_bucketed_corpus,
            )

            lab_ids, lab_valid = compact_labels(lab_mask)
            self.A = lab_ids.shape[1]
            self._buckets = bucket_encode(bows, n_buckets=self.n_buckets)
            self._corpus = shard_bucketed_corpus(
                self.mesh, self._buckets, lab_ids, lab_valid)
            self.state = init_bucketed_sharded(
                k0, self.mesh, self._corpus, self.V, self.Kp,
                n_chains=self.n_chains)
            self._loop = None
            self._master_key = jax.random.fold_in(self._key, 0x5eed)
            self._sweeps_done = 0
            return
        if sweep == "fused":
            lab_ids, lab_valid = compact_labels(lab_mask)
            self.A = lab_ids.shape[1]
            (self._tok_v_t, self._tok_f_t, self._lab_ids,
             self._lab_valid_t) = shard_fused_corpus(
                self.mesh, tok_v, tok_f, lab_ids, lab_valid)
            self.state: FusedShardedState = init_fused_sharded(
                k0, self.mesh, self._tok_v_t, self._tok_f_t, self._lab_ids,
                self._lab_valid_t, self.V, self.Kp, n_chains=self.n_chains,
            )
            self._loop = None  # whole-run jitted training loop
            # chunk-invariant RNG: block keys derive from a FIXED master key
            # + the global sweep counter, so checkpointed/resumed runs draw
            # the identical stream as uninterrupted ones
            self._master_key = jax.random.fold_in(self._key, 0x5eed)
            self._sweeps_done = 0
        else:
            self.tok_v, self.tok_f, self.labs = shard_corpus(
                self.mesh, tok_v, tok_f, lab_mask
            )
            self.state = init_sharded_state(
                k0, self.mesh, self.tok_v, self.tok_f, self.labs, self.V,
                n_chains=self.n_chains,
            )
            self._step = make_sharded_train_step(
                self.mesh, self.n_chains, alpha=self.alpha, beta=self.beta,
                topic_mask=self.topic_mask,
            )

    # ---------------------------------------------------------------- train

    def run_training(self, iters: int, thinning: int,
                     total_iters: int = None) -> None:
        """``iters`` AD-LDA sweeps; φ/θ folded into the thinned running means
        every ``thinning`` sweeps (reference rule, LabeledLDA.py:131-145).

        ``total_iters`` (chunked/checkpointed runs): the full planned sweep
        count, so the merge-block size — which is capped for tiny budgets —
        matches the uninterrupted run's and resume stays bit-identical.

        Large ``iters`` are dispatched internally in bounded chunks (the
        tunnelled backend's compiler crashes on monolithic multi-thousand-
        sweep scans) — bit-identical to one dispatch by the chunk-invariant
        RNG/merge-block design, and each chunk reuses ONE compiled program.
        """
        iters, thinning = int(iters), int(thinning)
        if self.table_shard == "vocab":
            from ..ops.gibbs_fused import select_merge_block
            from .vocab_sharded import (
                make_vocab_chains_train_loop,
                make_vocab_sharded_train_loop,
            )

            if self._loop is None:
                corpus = (self._tok_v_t, self._tok_f_t, self._lab_ids,
                          self._lab_valid_t)
                if self._vocab_chains:
                    self._loop = make_vocab_chains_train_loop(
                        self.mesh, self.n_chains, self.alpha, self.beta,
                        self.V, self.Kp, topic_mask=self.topic_mask,
                        corpus=corpus, table_i16=self._table_i16,
                    )
                else:
                    self._loop = make_vocab_sharded_train_loop(
                        self.mesh, self.alpha, self.beta, self.V, self.Kp,
                        topic_mask=self.topic_mask, corpus=corpus,
                        table_i16=self._table_i16,
                    )
            budget = int(total_iters) if total_iters else iters
            M = select_merge_block(self.merge_every, thinning, budget)
            self._check_merge_block(M)
            for step in self._dispatch_chunks(iters, thinning):
                self.state = self._loop(
                    self._master_key, self.state,
                    jnp.int32(self._sweeps_done),
                    iters=step, thinning=thinning, M=M,
                )
                self._sweeps_done += step
            return
        if self.sweep == "fused":
            if self._loop is None:
                if self.n_buckets > 1:
                    from .fused_sharded_buckets import (
                        make_bucketed_train_loop,
                    )

                    self._loop = make_bucketed_train_loop(
                        self.mesh, self.n_chains, alpha=self.alpha,
                        beta=self.beta, topic_mask=self.topic_mask,
                        corpus=self._corpus, table_i16=self._table_i16,
                    )
                else:
                    self._loop = make_fused_train_loop(
                        self.mesh, self.n_chains, alpha=self.alpha,
                        beta=self.beta, merge_every=self.merge_every,
                        topic_mask=self.topic_mask,
                        corpus=(self._tok_v_t, self._tok_f_t, self._lab_ids,
                                self._lab_valid_t),
                        table_i16=self._table_i16,
                    )
            from ..ops.gibbs_fused import select_merge_block

            budget = int(total_iters) if total_iters else iters
            M = select_merge_block(self.merge_every, thinning, budget)
            self._check_merge_block(M)
            for step in self._dispatch_chunks(iters, thinning):
                self.state = self._loop(
                    self._master_key, self.state,
                    jnp.int32(self._sweeps_done),
                    iters=step, thinning=thinning, M=M,
                )
                self._sweeps_done += step
            return
        for i in range(iters):
            self._key, k = jax.random.split(self._key)
            save = jnp.bool_((i + 1) % thinning == 0)
            self.state = self._step(
                k, self.state, self.tok_v, self.tok_f, self.labs, save
            )

    @staticmethod
    def _dispatch_chunks(iters: int, thinning: int, limit: int = 400):
        """Thinning-aligned dispatch chunks (shared helper, _util.py)."""
        return _dispatch_chunks(iters, thinning, limit)

    def _check_merge_block(self, merge: int) -> None:
        """Resume guard (shared helper, _util.py)."""
        _check_merge_block(self, merge)

    # ------------------------------------------------------------ estimators

    def pooled_phi(self) -> np.ndarray:
        """(K, V) chain-pooled thinned φ̂ (reference orientation)."""
        if self.table_shard == "vocab":
            # gather-on-export: the only time the full table leaves shards
            ph = np.asarray(self.state.ph_hat)  # (V, Kp) or (C, Vp, Kp)
            if self._vocab_chains:
                ph = ph[:, : self.V].mean(axis=0)
            else:
                ph = ph[: self.V]
            return ph[:, : self.K].T
        ph = np.asarray(self.state.ph_hat.mean(axis=0))  # (V, Kp)
        return ph[:, : self.K].T

    def get_phi(self) -> np.ndarray:
        return self.pooled_phi()

    def chain_phis(self) -> np.ndarray:
        """(C, K, V) per-chain thinned φ̂ — Monte-Carlo error diagnostics."""
        if self.table_shard == "vocab" and not self._vocab_chains:
            return self.pooled_phi()[None]  # single chain
        ph = np.asarray(self.state.ph_hat)  # (C, V[p], Kp)
        return ph[:, : self.V, : self.K].transpose(0, 2, 1)

    def mc_error(self) -> float:
        """Across-chain standard deviation of φ̂, averaged over entries."""
        if self.table_shard == "vocab" and not self._vocab_chains:
            return 0.0  # single chain — no across-chain spread
        ph = np.asarray(self.state.ph_hat)[:, : self.V, : self.K]
        return float(ph.std(axis=0).mean())

    # ----------------------------------------------------------------- test

    def run_test(self, newdocs, it: int, thinning: int,
                 chain: Optional[int] = None) -> np.ndarray:
        """Fold-in θ̂ against the pooled φ̂ (single-chip test kernel).

        ``chain`` — fold in against a single chain's φ̂ instead of the pool
        (per-chain quality diagnostics: the pooled estimate should match or
        beat any individual chain's AUC)."""
        bows = [self.dicti.doc2bow(doc) for doc in newdocs]
        tok_v, tok_f = encode_bow_types(bows)
        if self.table_shard == "vocab" and self._vocab_chains:
            ph = np.asarray(self.state.ph_hat)[:, : self.V]  # (C, V, Kp)
            phi_vk = jnp.asarray(ph.mean(axis=0) if chain is None
                                 else ph[int(chain)])
        elif self.table_shard == "vocab":
            if chain not in (None, 0):
                raise ValueError(
                    "table_shard='vocab' trains a single chain; per-chain "
                    f"diagnostics (chain={chain!r}) are not available — pass "
                    "chain=None (or 0) for the pooled phi")
            phi_vk = jnp.asarray(np.asarray(self.state.ph_hat)[: self.V])
        elif chain is None:
            phi_vk = self.state.ph_hat.mean(axis=0)  # (V, Kp)
        else:
            phi_vk = self.state.ph_hat[int(chain)]
        self._key, k = jax.random.split(self._key)
        avg, _ = _test_loop(
            k, jnp.asarray(tok_v), jnp.asarray(tok_f), phi_vk, self.topic_mask,
            it=int(it), thinning=int(thinning), alpha=self.alpha,
        )
        return np.asarray(avg[:, : self.K])
