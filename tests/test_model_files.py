"""Model-file compatibility regression tests.

Every .pv committed under models/ must load and run one frame through the
engine FOREVER — an engine upgrade can never break an existing model file
(reference bar: versioned lib/common/koala_params.pv loaded by every
engine release, SURVEY.md §2 #2). Round-3 regression: new DEFAULT_CONFIG
feature keys were back-filled over legacy saved configs, crashing every
committed blob at load (VERDICT r3 missing #1).
"""

import glob
import os

import numpy as np
import pytest

from koala_tpu.engine.core import make_engine
from koala_tpu.models import mask_gru, params_io

MODELS_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "models")

COMMITTED = sorted(glob.glob(os.path.join(MODELS_DIR, "*.pv")))


@pytest.mark.parametrize("path", COMMITTED or [None],
                         ids=[os.path.basename(p) for p in COMMITTED] or ["none"])
def test_committed_model_loads_and_steps(path):
    if path is None:
        pytest.skip("no committed model files")
    params, cfg = params_io.load_params(path)
    # The loaded config must be fully resolved and consistent with the
    # weights (the compatibility guard in params_io/normalize_config).
    assert "snr_bands" in cfg and "floor_feat" in cfg
    assert int(np.shape(params["enc"]["w"])[0]) == mask_gru.expected_enc_in(cfg)
    engine = make_engine(cfg.get("kind", "mask_gru"), dict(cfg, use_pallas=False))
    state = engine.init_state(())
    frame = np.zeros((256,), np.float32)
    frame[::7] = 0.05
    state, out = engine.step(params, state, frame)
    out = np.asarray(out)
    assert out.shape == (256,)
    assert np.all(np.isfinite(out))


def test_legacy_config_not_reinterpreted_by_new_defaults(tmp_path):
    """A file saved with a partial (legacy) config must resolve to the
    feature layout its weights were built with, whatever DEFAULT_CONFIG
    says now."""
    import jax

    legacy_cfg = {"kind": "mask_gru", "hidden": 64, "num_layers": 1,
                  "bins": 257, "snr_bands": 0, "floor_feat": False}
    params = mask_gru.init_params(jax.random.PRNGKey(0), legacy_cfg)
    path = str(tmp_path / "legacy.pv")
    params_io.save_params(path, params, {"kind": "mask_gru", "hidden": 64,
                                         "num_layers": 1, "bins": 257})
    loaded, cfg = params_io.load_params(path)
    assert cfg["snr_bands"] == 0 and cfg["floor_feat"] is False
    engine = make_engine("mask_gru", dict(cfg, use_pallas=False))
    state, out = engine.step(params, engine.init_state(()),
                             np.zeros((256,), np.float32))
    assert np.asarray(out).shape == (256,)


def test_tracker_config_roundtrip(tmp_path):
    """A file saved with the current TRAIN_CONFIG carries its switches
    explicitly and loads with them intact."""
    import jax

    cfg = dict(mask_gru.TRAIN_CONFIG, hidden=64, num_layers=1)
    params = mask_gru.init_params(jax.random.PRNGKey(1), cfg)
    path = str(tmp_path / "tracker.pv")
    params_io.save_params(path, params, cfg)
    loaded, lcfg = params_io.load_params(path)
    assert lcfg["snr_bands"] == 32 and lcfg["floor_feat"] is True
    engine = make_engine("mask_gru", dict(lcfg, use_pallas=False))
    state, out = engine.step(params, engine.init_state(()),
                             np.zeros((256,), np.float32))
    assert np.asarray(out).shape == (256,)
