"""Probe: why is the distributed fused loop ~90x slower per sweep than the
single-chip bucketed path on one chip?

Times three structures on the real corpus at the chain_scaling config
(depth 3, unpruned dict, Kp=512, global (U, D) padding):
  a) raw fused_train_block, jitted, 10 blocks of M=5 (library layout)
  b) make_fused_train_loop single-device, 50 sweeps, 1 chain
  c) the single-chip model path (bucketed) for reference
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from lda_thesis_tpu.data.corpus import load_corpus, split_data
from lda_thesis_tpu.data.vocab import prune_dict
from lda_thesis_tpu.data.encode import (
    encode_bow_types, binarize_labels, build_labelmap, compact_labels,
)

DATA = "/root/reference/abstracts_data.csv"

corpus = load_corpus(DATA, d=3, mode="truncate")
train, _ = split_data(corpus, seed=42)
dicti = prune_dict(train.docs, lower=0, upper=1)
bows = [dicti.doc2bow(doc) for doc in train.docs]
tok_v, tok_f = encode_bow_types(bows)
labs = binarize_labels(train.labs, build_labelmap(train.labelset))
V = len(dicti)
Kp = 128 * ((labs.shape[1] + 127) // 128)
labs_p = np.pad(labs, ((0, 0), (0, Kp - labs.shape[1])))
lab_ids, lab_valid = compact_labels(labs_p)
A = lab_ids.shape[1]
D, U = tok_v.shape
tokens = float(tok_f.sum())
print(f"D={D} U={U} A={A} V={V} Kp={Kp} tokens/sweep={tokens}", flush=True)

from lda_thesis_tpu.ops.gibbs_fused import (
    FusedLDAState, fused_train_block, init_fused,
)

key = jax.random.PRNGKey(0)
st = init_fused(key, jnp.asarray(tok_v), jnp.asarray(tok_f),
                jnp.asarray(lab_ids), jnp.asarray(lab_valid), V, Kp)
tvt = jnp.asarray(tok_v.T)
tft = jnp.asarray(tok_f.T, jnp.float32)
li = jnp.asarray(lab_ids)
lvt = jnp.asarray(lab_valid.T, jnp.float32)

# (a) raw block, jitted once, scan of 10 blocks inside one jit
from functools import partial

@partial(jax.jit, static_argnames=("M", "nblocks"))
def run_blocks(key, st, M: int, nblocks: int):
    def body(st, k):
        return fused_train_block(k, st, tvt, tft, li, lvt, 0.1, 0.01, M), None
    st, _ = jax.lax.scan(body, st, jax.random.split(key, nblocks))
    return st

t0 = time.perf_counter()
st2 = run_blocks(key, st, M=5, nblocks=10)
jax.block_until_ready(st2.n_vk)
print(f"(a) compile+first: {time.perf_counter()-t0:.2f}s", flush=True)
t0 = time.perf_counter()
st2 = run_blocks(jax.random.fold_in(key, 1), st, M=5, nblocks=10)
jax.block_until_ready(st2.n_vk)
dt = time.perf_counter() - t0
print(f"(a) raw 50 sweeps warm: {dt:.2f}s = {50/dt:.1f} sweeps/s = {tokens*50/dt/1e6:.2f}M tok/s", flush=True)

# (b) distributed loop, single device
from lda_thesis_tpu.parallel import make_mesh
from lda_thesis_tpu.parallel.fused_sharded import (
    init_fused_sharded, make_fused_train_loop, shard_fused_corpus,
)

mesh = make_mesh(n_data=1, n_chains=1)
corpus_sh = shard_fused_corpus(mesh, tok_v, tok_f, lab_ids, lab_valid)
stt = init_fused_sharded(key, mesh, *corpus_sh, V, Kp, n_chains=1)
loop = make_fused_train_loop(mesh, 1, alpha=0.1, beta=0.01, merge_every=5,
                             topic_mask=None, corpus=corpus_sh)
t0 = time.perf_counter()
out = loop(key, stt, jnp.int32(0), iters=50, thinning=50, M=5)
jax.block_until_ready(out.n_vk)
print(f"(b) compile+first: {time.perf_counter()-t0:.2f}s", flush=True)
t0 = time.perf_counter()
out = loop(jax.random.fold_in(key, 1), stt, jnp.int32(0), iters=50, thinning=50, M=5)
jax.block_until_ready(out.n_vk)
dt = time.perf_counter() - t0
print(f"(b) dist-loop 50 sweeps warm: {dt:.2f}s = {50/dt:.1f} sweeps/s = {tokens*50/dt/1e6:.2f}M tok/s", flush=True)
