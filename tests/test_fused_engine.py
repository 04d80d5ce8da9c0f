"""Fused whole-engine Pallas kernel (ops/pallas/engine_fused.py).

Pillars:
- interpret-mode kernel == pure-jnp mirror (exact op order/dtype parity)
- chunked fused == continuous fused (state chaining is exact)
- fused numerics vs the standard XLA sequence engine: same audio within
  bf16 spectral rounding (~ -40 dB), i.e. quality-neutral
- state pytree contract matches engine.core's sequence
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from koala_tpu.engine.core import make_engine
from koala_tpu.models import mask_gru
from koala_tpu.ops.pallas.engine_fused import (
    T_BLOCK, fused_sequence, fused_sequence_ref, fused_sequence_supported)

CFG = dict(mask_gru.TRAIN_CONFIG)
B, T = 8, 24


@pytest.fixture(scope="module")
def setup():
    params = mask_gru.init_params(jax.random.PRNGKey(3), CFG)
    engine = make_engine("mask_gru", CFG)
    state = engine.init_state((B,))
    hops = 0.05 * jax.random.normal(jax.random.PRNGKey(4), (B, T, 256),
                                    jnp.float32)
    return params, engine, state, hops


def test_supported_shapes():
    assert fused_sequence_supported(CFG, 512, 376)
    assert fused_sequence_supported(CFG, 8, T_BLOCK)
    assert not fused_sequence_supported(CFG, 512, 375)      # T % 8
    assert not fused_sequence_supported(CFG, 9, 376)        # B tiling
    assert not fused_sequence_supported(dict(CFG, snr_bands=0), 512, 376)
    assert not fused_sequence_supported(
        dict(CFG, compute_dtype="float32"), 512, 376)


def test_interpret_matches_mirror(setup):
    params, _, state, hops = setup
    st_k, out_k = fused_sequence(params, state, hops, CFG,
                                 interpret=True, b_tile=B)
    st_r, out_r = fused_sequence_ref(params, state, hops, CFG)
    np.testing.assert_allclose(out_k, out_r, atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(st_k["ola"], st_r["ola"], atol=1e-5)
    np.testing.assert_allclose(st_k["model"]["h"], st_r["model"]["h"],
                               atol=1e-5)
    np.testing.assert_allclose(st_k["model"]["floor"],
                               st_r["model"]["floor"], atol=1e-6)


def test_interpret_batch_tiling():
    """Tiling the batch must not change results (same audio; summation
    order inside the backend's matmul may differ at float epsilon)."""
    params = mask_gru.init_params(jax.random.PRNGKey(3), CFG)
    engine = make_engine("mask_gru", CFG)
    state = engine.init_state((16,))
    hops = 0.05 * jax.random.normal(jax.random.PRNGKey(5), (16, T_BLOCK, 256),
                                    jnp.float32)
    st1, out1 = fused_sequence(params, state, hops, CFG,
                               interpret=True, b_tile=16)
    st2, out2 = fused_sequence(params, state, hops, CFG,
                               interpret=True, b_tile=8)
    np.testing.assert_allclose(out1, out2, atol=1e-4, rtol=1e-3)
    np.testing.assert_allclose(st1["ola"], st2["ola"], atol=1e-4)


def test_chunked_equals_continuous(setup):
    """Fused over [0:T] == fused over [0:T1] then [T1:T] (exact chaining)."""
    params, _, state, hops = setup
    _, out_full = fused_sequence(params, state, hops, CFG,
                                 interpret=True, b_tile=B)
    t1 = T_BLOCK
    st_a, out_a = fused_sequence(params, state, hops[:, :t1], CFG,
                                 interpret=True, b_tile=B)
    _, out_b = fused_sequence(params, st_a, hops[:, t1:], CFG,
                              interpret=True, b_tile=B)
    np.testing.assert_array_equal(
        np.concatenate([np.asarray(out_a), np.asarray(out_b)], axis=1),
        np.asarray(out_full))


def test_close_to_xla_engine(setup):
    """bf16 spectral rounding only: fused output tracks the XLA sequence
    engine within ~-40 dB (quality-neutral; DESIGN.md §1)."""
    params, engine, state, hops = setup
    _, out_ref = fused_sequence_ref(params, state, hops, CFG)
    _, out_xla = engine.sequence(params, state, hops)
    err = np.asarray(out_ref - out_xla)
    sig = np.asarray(out_xla)
    snr_db = 10 * np.log10(np.sum(sig ** 2) / max(np.sum(err ** 2), 1e-20))
    assert snr_db > 35.0, f"fused-vs-XLA agreement only {snr_db:.1f} dB"


def test_state_contract(setup):
    params, engine, state, hops = setup
    st, out = fused_sequence(params, state, hops, CFG,
                             interpret=True, b_tile=B)
    assert out.shape == (B, T, 256) and out.dtype == jnp.float32
    assert st["input_carry"].shape == state["input_carry"].shape
    assert st["ola"].shape == state["ola"].shape
    assert st["model"]["h"].shape == state["model"]["h"].shape
    assert st["model"]["floor"].shape == state["model"]["floor"].shape
    np.testing.assert_array_equal(st["input_carry"], hops[:, -1, :])
