"""Drop-in multi-chain HSLDA trainer over a ``(chains, data)`` mesh.

``DistributedHSLDA`` keeps the single-chain :class:`models.hslda.HSLDA` API
(same constructor, ``run_training``, ``run_tests``) but trains ``n_chains``
independent blocked-Gibbs chains with documents sharded over the mesh
(parallel/hslda_sharded.py — AD-LDA ``psum`` count merges, psum'd Gram
matrices for η).  This is the trainer the north-star config #5 describes
(64 HSLDA chains over a pod slice); on one chip it is also the natural way
to get posterior-averaged predictions.

Prediction pools over chains by **model averaging of probabilities**, not
parameters: HSLDA's latent topics are not identifiable across chains (no
label-tying as in Labeled LDA), so averaging φ or η across chains would mix
incompatible topic bases.  Instead each chain runs its own fold-in test
inference (vmapped over the chain axis) and the per-chain label scores
Φ(η_c·z̄_c − ξ) — which *are* comparable — are averaged.  This is standard
Monte-Carlo averaging over independent posterior samples.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..models.hslda import HSLDA, _norm_cdf, _test_loop
from .hslda_sharded import (
    HSLDAShardedState,
    init_hslda_sharded,
    make_hslda_train_loop,
    shard_hslda_corpus,
)
from .sharded import make_mesh

__all__ = ["DistributedHSLDA"]


class DistributedHSLDA(HSLDA):
    """HSLDA with ``n_chains`` sharded chains; API-compatible with HSLDA."""

    def __init__(
        self,
        docs: Sequence[Sequence[str]],
        labs: Sequence[Sequence[str]],
        labelset: Sequence[str],
        mesh=None,
        n_chains: int = 8,
        table_shard: str = "replicated",
        **kwargs,
    ):
        super().__init__(docs, labs, labelset, **kwargs)
        self.mesh = mesh if mesh is not None else make_mesh(n_chains=1)
        if n_chains % self.mesh.shape["chains"]:
            raise ValueError(
                f"n_chains={n_chains} not divisible by mesh chains axis "
                f"{self.mesh.shape['chains']}"
            )
        self.n_chains = int(n_chains)
        # table_shard="vocab" (round-5 VERDICT item 4): each chain's (V, K)
        # table — and the thinned ph_hat — keep their V axis sharded over
        # the data mesh axis; per-device persistent table memory drops
        # S-fold (the axis that dominates the 64-chain north-star
        # footprint).  Bit-identical draws to the replicated mode.
        if table_shard not in ("replicated", "vocab"):
            raise ValueError(f"unknown table_shard {table_shard!r}")
        self.table_shard = table_shard
        S = self.mesh.shape["data"]
        self._Vp = (((self.V + S - 1) // S) * S if table_shard == "vocab"
                    else self.V)
        self.state: Optional[HSLDAShardedState] = None
        # sharded (doc-padded) corpus copies
        self._sh_tok_v, self._sh_mask, self._sh_labs = shard_hslda_corpus(
            self.mesh, np.asarray(self.tok_v), np.asarray(self.mask),
            np.asarray(self.labs),
        )
        self._ph_hat: Optional[np.ndarray] = None  # (C, K, V) thinned mean
        self._n_saves = 0
        self._loops = {}  # opt -> whole-run jitted training loop
        # chunk-invariant RNG: cycle i draws from fold_in(master, i) with i
        # counted globally, so chunked/resumed runs are bit-identical to
        # uninterrupted ones (persisted by sharded_io.save_hslda_sharded)
        self._master_key = jax.random.fold_in(self._key, 0x45D)
        self._cycles_done = 0

    # ------------------------------------------------------------------ train

    def run_training(self, it: int = 25, thinning: int = 5, opt: int = 1,
                     continue_avg: bool = False) -> None:
        """``it`` sharded blocked-Gibbs cycles over all chains — ONE
        whole-run jitted dispatch (scan over save blocks with the thinned
        per-chain φ̂ mean folded in on block boundaries,
        parallel/hslda_sharded.make_hslda_train_loop; the per-cycle
        dispatch structure cost ~0.4 s/cycle on the tunnelled backend —
        round-4 VERDICT item 3).

        ``continue_avg=True`` carries the thinned φ̂ mean across calls (for
        checkpointed / chunked training); the default restarts it each call,
        matching base HSLDA.run_training's per-call running mean.
        """
        if not continue_avg:
            self._n_saves = 0
            self._ph_hat = None
        if self.state is None:
            self._key, k = jax.random.split(self._key)
            self.state = init_hslda_sharded(
                k, self.mesh, self._sh_tok_v, self._sh_mask, self._sh_labs,
                self.V, self.K, n_chains=self.n_chains,
                alpha=self.alpha, aprime=self.aprime, mu=self.mu,
                table_shard=self.table_shard,
            )
        opt = int(opt)
        if self._loops.get(opt) is None:
            self._loops[opt] = make_hslda_train_loop(
                self.mesh, self.n_chains, self._stirling_logs,
                D_total=self.D, alpha=self.alpha, aprime=self.aprime,
                gamma=self.gamma, mu=self.mu, sigma=self.sigma, xi=self.xi,
                opt=opt, table_shard=self.table_shard, V=self.V,
            )
        C, K = self.n_chains, self.K
        ph_hat = (np.zeros((C, K, self._Vp), np.float32)
                  if self._ph_hat is None
                  else np.asarray(self._ph_hat, np.float32))
        if self.table_shard == "vocab":
            from jax.sharding import NamedSharding, PartitionSpec as P

            ph_hat = jax.device_put(
                ph_hat, NamedSharding(self.mesh, P("chains", None, "data")))
        else:
            ph_hat = jnp.asarray(ph_hat)
        n_saves = jnp.int32(self._n_saves)
        # bounded dispatch chunks aligned to thinning (the tunnelled
        # compiler crashes on monolithic multi-cycle scans — e.g. the
        # 8-chain opt-2 program at 25 cycles); bit-identical to one
        # dispatch by the cycle-counter RNG, one program shape per size
        from ._util import dispatch_chunks

        it, thinning = int(it), int(thinning)
        state = self.state
        for step in dispatch_chunks(it, thinning, limit=10):
            state, ph_hat, n_saves = self._loops[opt](
                self._master_key, state, self._sh_tok_v, self._sh_mask,
                self._sh_labs, ph_hat, n_saves,
                jnp.int32(self._cycles_done), iters=step, thinning=thinning,
            )
            self._cycles_done += step
        jax.block_until_ready(state)
        self.state = state
        self._n_saves = int(n_saves)
        self._ph_hat = np.asarray(ph_hat) if self._n_saves else None

    def _chain_ph(self) -> np.ndarray:
        """(C, K, V) per-chain unsmoothed topic-word estimates."""
        n_vk = np.asarray(self.state.n_vk)[:, : self.V]  # drop vocab padding
        n_kv = n_vk.transpose(0, 2, 1).astype(np.float64)
        return n_kv / np.maximum(n_kv.sum(axis=2, keepdims=True), 1)

    # ------------------------------------------------------------ diagnostics
    #
    # The inherited diagnostics read the single-chain state initialised by
    # ``HSLDA.__init__`` which the sharded trainer never updates — they are
    # overridden here to read the trained per-chain state.  Topics are NOT
    # identifiable across chains (no label tying), so φ/z̄ diagnostics report
    # chain 0; ``_chain_ph()`` gives all chains.

    def get_ph(self) -> np.ndarray:
        """(K, V) chain-0 unsmoothed topic-word estimate (see class note)."""
        if self.state is None:
            return super().get_ph()
        return self._chain_ph()[0]

    def get_zbar(self) -> np.ndarray:
        """(D, K) chain-0 empirical topic mixtures over the real documents."""
        if self.state is None:
            return super().get_zbar()
        n_dk = np.asarray(self.state.n_dk)[0][: self.D]
        n_d = np.maximum(np.asarray(self.mask.sum(axis=1)), 1)
        return n_dk / n_d[:, None]

    # ------------------------------------------------------------ persistence
    #
    # A jax Mesh holds Device objects and the sharded arrays hold device
    # buffers — neither pickles.  Snapshot everything as host numpy and the
    # mesh as its axis sizes; restore rebuilds the mesh when the current
    # process has enough devices (else ``mesh=None`` — predictions still
    # work from the numpy state, further training requires re-attaching a
    # mesh via ``make_mesh``).

    def __getstate__(self):
        d = dict(self.__dict__)
        d["_mesh_shape"] = dict(self.mesh.shape) if self.mesh is not None else None
        d["mesh"] = None
        d["_loops"] = {}  # jitted closures rebuild lazily on next training
        return jax.tree_util.tree_map(
            lambda x: np.asarray(x) if isinstance(x, jax.Array) else x, d
        )

    def __setstate__(self, d):
        mesh_shape = d.pop("_mesh_shape", None)
        self.__dict__.update(d)
        if mesh_shape is not None:
            try:
                need = mesh_shape.get("chains", 1) * mesh_shape.get("data", 1)
                if len(jax.devices()) >= need:
                    self.mesh = make_mesh(
                        n_chains=mesh_shape.get("chains", 1),
                        n_data=mesh_shape.get("data", 1),
                        devices=jax.devices()[:need],
                    )
            except Exception:
                self.mesh = None

    # ------------------------------------------------------------------- test

    def run_tests(self, newdocs: Sequence[Sequence[str]], it: int = 250,
                  s: int = 25) -> np.ndarray:
        """Chain-averaged label probabilities for held-out docs.

        Each chain folds the docs in against its own (φ̂_c, η_c, β_c) — one
        vmapped `_test_loop` over the chain axis — and the resulting
        Φ(η_c·z̄_c − ξ) probabilities are averaged over chains.
        """
        assert self.state is not None, "run_training first"
        tok_v, mask = self._encode_test(newdocs)
        C = self.n_chains

        ph = self._ph_hat if self._ph_hat is not None else self._chain_ph()
        ph = np.asarray(ph)[:, :, : self.V]  # drop vocab padding (vocab mode)
        init_phi = jnp.asarray(ph.transpose(0, 2, 1), jnp.float32)  # (C, V, K)
        sweep = (np.asarray(self.state.n_vk)[:, : self.V].astype(np.float64)
                 + self.gamma)
        sweep = sweep / sweep.sum(axis=1, keepdims=True)  # normalise over V
        sweep_phi = jnp.asarray(sweep, jnp.float32)  # (C, V, K)
        alpha_beta = self.alpha * jnp.asarray(self.state.beta)  # (C, K)

        self._key, k = jax.random.split(self._key)
        keys = jax.random.split(k, C)
        zbar = jax.vmap(
            lambda kk, ip, sp, ab: _test_loop(
                kk, tok_v, mask, ip, sp, ab, it=int(it), thinning=int(s)
            )
        )(keys, init_phi, sweep_phi, alpha_beta)  # (C, Dt, K)

        eta = jnp.asarray(self.state.eta)  # (C, L, K)
        mean_a = jnp.einsum("cdk,clk->cdl", zbar, eta) - self.xi
        scores = _norm_cdf(mean_a).mean(axis=0)  # average over chains
        return np.asarray(scores)
