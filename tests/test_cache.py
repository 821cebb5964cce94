"""Persistent compile cache helper (utils/cache.py)."""

import os

from lda_thesis_tpu.utils import cache


def _reset():
    cache._enabled = False


def test_enable_sets_jax_config(tmp_path, monkeypatch):
    _reset()
    target = str(tmp_path / "xla")
    got = cache.enable_persistent_cache(target)
    assert got == target
    assert os.path.isdir(target)
    import jax

    assert jax.config.jax_compilation_cache_dir == target
    # idempotent: second call returns the same dir without re-configuring
    assert cache.enable_persistent_cache(target) == target


def test_disabled_by_env(monkeypatch):
    _reset()
    monkeypatch.setenv("LDA_NO_CACHE", "1")
    assert cache.enable_persistent_cache() is None


def test_env_dir_override(tmp_path, monkeypatch):
    _reset()
    target = str(tmp_path / "envdir")
    monkeypatch.setenv("LDA_CACHE_DIR", target)
    assert cache.enable_persistent_cache() == target
