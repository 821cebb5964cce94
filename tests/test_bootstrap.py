"""Multi-host bootstrap + north-star 64-chain config on the fake 8-CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lda_thesis_tpu.data.encode import encode_instances
from lda_thesis_tpu.ops.sampling import stirling_table
from lda_thesis_tpu.parallel import (
    chains_for,
    initialize_distributed,
    is_distributed,
    make_global_mesh,
)
from lda_thesis_tpu.parallel.hslda_sharded import (
    init_hslda_sharded,
    make_hslda_train_step,
    pooled_ph,
    shard_hslda_corpus,
)


def test_initialize_distributed_single_host_noop():
    from lda_thesis_tpu.parallel import bootstrap

    bootstrap._reset_for_tests()
    initialize_distributed()  # no coordinator anywhere -> must be a no-op
    assert not is_distributed()
    assert jax.process_count() == 1
    initialize_distributed()  # idempotent


def test_make_global_mesh_shapes():
    assert jax.device_count() >= 8
    mesh = make_global_mesh(n_chains=2)
    assert dict(mesh.shape) == {"chains": 2, "data": jax.device_count() // 2}
    mesh = make_global_mesh(n_chains=4, n_data=2, devices=jax.devices()[:8])
    assert dict(mesh.shape) == {"chains": 4, "data": 2}
    with pytest.raises(ValueError):
        make_global_mesh(n_chains=3, devices=jax.devices()[:8])


def test_chains_for_split():
    mesh = make_global_mesh(n_chains=8, n_data=1, devices=jax.devices()[:8])
    assert chains_for(64, mesh) == (8, 8)
    with pytest.raises(ValueError):
        chains_for(63, mesh)


def test_north_star_64_chain_hslda():
    """BASELINE.json config #5: 64 HSLDA chains sharded over the mesh —
    8 mesh chain-rows x 8 vmapped chains/shard on the fake 8-device mesh.
    One full blocked-Gibbs cycle preserving every count invariant."""
    mesh = make_global_mesh(n_chains=8, n_data=1, devices=jax.devices()[:8])
    mesh_chains, per_shard = chains_for(64, mesh)
    assert (mesh_chains, per_shard) == (8, 8)

    rng = np.random.default_rng(0)
    D, V, K, L = 16, 32, 4, 5
    docs = [rng.integers(0, V, size=rng.integers(3, 7)).tolist() for _ in range(D)]
    tok_v, mask = encode_instances(docs)
    labs = np.zeros((D, L), np.float32)
    labs[:, 0] = 1
    for d in range(D):
        labs[d, rng.integers(1, L)] = 1
    tok_v, mask, labs = shard_hslda_corpus(mesh, tok_v, mask, labs)

    state = init_hslda_sharded(
        jax.random.PRNGKey(0), mesh, tok_v, mask, labs, V, K, n_chains=64
    )
    logs = np.log(np.where(stirling_table(16) > 0, stirling_table(16), 1e-300))
    step = make_hslda_train_step(
        mesh, 64, jnp.asarray(logs, jnp.float32), D_total=int(tok_v.shape[0])
    )
    state = step(jax.random.PRNGKey(1), state, tok_v, mask, labs)
    jax.block_until_ready(state)

    assert state.z.shape[0] == 64
    total = int(np.asarray(mask).sum())
    n_dk = np.asarray(state.n_dk)
    n_vk = np.asarray(state.n_vk)
    n_k = np.asarray(state.n_k)
    for c in range(64):
        assert int(n_dk[c].sum()) == total
        assert int(n_vk[c].sum()) == total
        np.testing.assert_array_equal(n_vk[c].sum(axis=0), n_k[c])
    # chains decorrelated (spot-check a few pairs)
    z = np.asarray(state.z)
    diffs = sum(
        int(not np.array_equal(z[i], z[j])) for i, j in [(0, 1), (7, 8), (31, 63)]
    )
    assert diffs >= 2
    ph = np.asarray(pooled_ph(state, gamma=1.0))
    assert ph.shape == (K, V)
    np.testing.assert_allclose(ph.sum(axis=1), 1.0, rtol=1e-4)
