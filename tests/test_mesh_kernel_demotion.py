"""Multi-chip meshes demote auto's Pallas kernels to the XLA graph paths
(GSPMD cannot partition Mosaic custom calls — chain._demote_kernels_for_mesh).
"""



import numpy as np
import pytest

from upscale_video_tpu.models import zoo
from upscale_video_tpu.pipeline.chain import ChainEngine, ChainSpec


@pytest.fixture(autouse=True)
def _small_valar(monkeypatch):
    """2 RRDBs instead of 23: the demotion logic is block-count-agnostic
    and the full synthetic net costs ~30 s of trace per engine."""
    orig = zoo.make_synthetic_rrdb_model

    def small(*args, **kwargs):
        kwargs["num_rrdb"] = 2  # override the call site's 23
        return orig(*args, **kwargs)

    monkeypatch.setattr(zoo, "make_synthetic_rrdb_model", small)


def _valar_engine(conv_impl):
    return ChainEngine.build(
        ChainSpec.parse("r"), 4, synthetic=True, conv_impl=conv_impl,
        tile=16, halo=4,
    )


def test_auto_demotes_rdb_on_mesh(caplog):
    eng = _valar_engine("auto")
    assert eng.sr_model.rdb_kernel  # single-chip auto keeps the kernel
    n = eng.configure_chips("0,1", 2)
    assert n >= 2
    assert not eng.sr_model.rdb_kernel
    assert not eng.sr_model.pallas_conv


def test_explicit_rdb_kept_on_mesh_with_warning(caplog):
    import logging

    eng = _valar_engine("rdb")
    with caplog.at_level(logging.WARNING):
        eng.configure_chips("0,1", 2)
    assert eng.sr_model.rdb_kernel  # explicit choice honored
    assert any("not partitionable" in r.message for r in caplog.records)


def test_demoted_engine_runs_on_mesh(rng):
    """The demoted step executes under the dp mesh and equals the explicit
    XLA-scatter engine (post-demotion they are the same implementation;
    kernel-vs-scatter closeness itself is pinned by test_rdb_pallas with
    controlled block counts — 23 random RRDBs amplify bf16 rounding to
    many u8 LSB, PARITY.md)."""
    eng = _valar_engine("auto")
    ref = _valar_engine("xla")
    ref.sr_model.params = eng.sr_model.params
    eng.configure_chips("0,1", 2)
    assert not eng.sr_model.rdb_kernel
    x = rng.integers(0, 256, (2, 12, 14, 3), dtype=np.uint8)
    a = np.asarray(eng.step(x)).astype(np.int32)
    b = np.asarray(ref.step(x)).astype(np.int32)
    assert a.shape == b.shape == (2, 48, 56, 3)
    np.testing.assert_array_equal(a, b)
