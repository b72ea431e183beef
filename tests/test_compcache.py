"""Persistent compilation cache wiring (utils/compcache.py)."""

import importlib

import jax
import pytest

from upscale_video_tpu.utils import compcache


@pytest.fixture(autouse=True)
def _restore_cache_config():
    before = jax.config.jax_compilation_cache_dir
    yield
    jax.config.update("jax_compilation_cache_dir", before)
    importlib.reload(compcache)  # reset _DONE for later engine builds


def _reset():
    importlib.reload(compcache)


def test_enable_sets_config(tmp_path, monkeypatch):
    _reset()
    d = str(tmp_path / "xla_cache")
    got = compcache.enable_compilation_cache(d)
    assert got == d
    assert jax.config.jax_compilation_cache_dir == d
    # idempotent: second call keeps the first dir
    assert compcache.enable_compilation_cache("/elsewhere") == "/elsewhere"
    assert jax.config.jax_compilation_cache_dir == d


def test_env_opt_out(monkeypatch):
    _reset()
    monkeypatch.setenv("UPSCALE_TPU_COMPILATION_CACHE_DIR", "off")
    assert compcache.enable_compilation_cache() is None


def test_env_retarget(tmp_path, monkeypatch):
    _reset()
    d = str(tmp_path / "alt")
    monkeypatch.setenv("UPSCALE_TPU_COMPILATION_CACHE_DIR", d)
    assert compcache.enable_compilation_cache() == d
