"""Definitive A/B: the bench model's run_training vs a raw 20-sweep scan on
the model's OWN device arrays, same process, interleaved."""

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
from lda_thesis_tpu.models.labeled_lda import LabeledLDA
from lda_thesis_tpu.ops.gibbs import LDACounts, train_sweep

DATA = "/root/reference/abstracts_data.csv"
S = 20


def main():
    corpus = load_corpus(DATA, d=3, mode="truncate")
    train, _ = split_data(corpus, seed=42)
    dicti = prune_dict(train.docs, lower=0, upper=1)
    model = LabeledLDA(train.docs, train.labs, list(train.labelset), dicti,
                       alpha=0.1, beta=0.01, seed=0)
    tok_v, tok_f, labs = model.toks_v[0], model.toks_f[0], model.labs_t[0]
    print(f"shapes: tok {tok_v.shape} labs {labs.shape} V={model.V} "
          f"tokens/sweep={model.n_tokens}", flush=True)

    c0 = LDACounts(z=model.counts.z[0], n_dk=model.counts.n_dk[0],
                   n_vk=model.counts.n_vk, n_k=model.counts.n_k)

    @jax.jit
    def raw(key, c):
        def body(c, k):
            return train_sweep(k, c, tok_v, tok_f, labs, 0.1, 0.01), None
        c, _ = jax.lax.scan(body, c, jax.random.split(key, S))
        return c

    key = jax.random.PRNGKey(0)
    c = raw(key, c0); jax.block_until_ready(c)
    model.run_training(S, S, perplexity=False)  # warm

    for w in range(3):
        key, k = jax.random.split(key)
        t0 = time.perf_counter(); c = raw(k, c); jax.block_until_ready(c)
        t_raw = time.perf_counter() - t0
        t0 = time.perf_counter()
        model.run_training(S, S, perplexity=False)
        jax.block_until_ready(model.counts)
        t_model = time.perf_counter() - t0
        n = model.n_tokens * S
        print(f"w{w}: raw {n/t_raw/1e6:6.2f} M tok/s   "
              f"model {n/t_model/1e6:6.2f} M tok/s", flush=True)


if __name__ == "__main__":
    main()
