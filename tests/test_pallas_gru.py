"""Fused Pallas GRU kernel vs the XLA scan reference (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from koala_tpu.models import mask_gru
from koala_tpu.ops.pallas.gru import (
    flatten_layer_params,
    gru_stack_pallas,
    gru_stack_supported,
)


def test_supported_gate():
    assert gru_stack_supported(2, 64, 384)
    assert gru_stack_supported(1, 64, 384)          # any L >= 1 now
    assert gru_stack_supported(3, 64, 384)
    assert not gru_stack_supported(0, 64, 384)      # no layers
    assert not gru_stack_supported(2, 7, 384)       # batch not multiple of 8
    assert not gru_stack_supported(2, 64, 200)      # hidden not 128-aligned
    assert not gru_stack_supported(2, 100000, 384)  # VMEM blowout
    assert not gru_stack_supported(12, 64, 384)     # weights alone bust VMEM


def _scan_reference(params, cfg, x, state):
    """The lax.scan path of apply_sequence, replicated on raw x."""
    st = state
    xs = x
    for i, layer in enumerate(params["gru"]):
        xproj = mask_gru._mm(xs, layer["wx"], cfg) + layer["bx"]
        xproj_t = jnp.moveaxis(xproj, 1, 0)

        def scan_fn(hh, xp, _layer=layer):
            h_new = mask_gru._gru_recurrent(_layer, hh, xp, cfg)
            return h_new, h_new

        h_final, hs = jax.lax.scan(scan_fn, st[..., i, :], xproj_t)
        st = st.at[..., i, :].set(h_final)
        xs = xs + jnp.moveaxis(hs, 0, 1)
    return xs, st


@pytest.mark.parametrize("layers", [1, 2, 3])
def test_kernel_matches_scan_reference(rng, layers):
    """Kernel output must match the lax.scan path (same bf16 numerics)
    at every supported layer count."""
    b, t, h = 8, 12, 384
    cfg = dict(mask_gru.DEFAULT_CONFIG, use_pallas=False, num_layers=layers)
    params = mask_gru.init_params(jax.random.PRNGKey(3), cfg)

    x = jnp.asarray(rng.standard_normal((b, t, h)).astype(np.float32) * 0.3)
    state = jnp.asarray(
        rng.standard_normal((b, layers, h)).astype(np.float32) * 0.2)

    ref_y, ref_state = _scan_reference(params, cfg, x, state)

    y, h_final = gru_stack_pallas(
        jnp.moveaxis(state, 1, 0),
        jnp.moveaxis(x, 1, 0),
        *flatten_layer_params(params["gru"]),
        interpret=True)

    # The kernel streams xp/x/y as bf16 (one extra rounding vs the f32
    # scan path), so comparison is at bf16 resolution, not f32.
    np.testing.assert_allclose(np.asarray(jnp.moveaxis(y, 0, 1).astype(jnp.float32)),
                               np.asarray(ref_y), atol=4e-2, rtol=2e-2)
    np.testing.assert_allclose(np.asarray(jnp.moveaxis(h_final, 0, 1)),
                               np.asarray(ref_state), atol=4e-2, rtol=2e-2)
    # and tightly correlated
    a = np.asarray(jnp.moveaxis(y, 0, 1).astype(jnp.float32)).ravel()
    b_ = np.asarray(ref_y).ravel()
    assert np.corrcoef(a, b_)[0, 1] > 0.99999


@pytest.mark.parametrize("layers", [1, 2])
def test_trainable_gradients_match_scan_reference(rng, layers):
    """gru_stack_trainable's custom_vjp (analytic reverse scan over
    kernel-streamed hidden residuals) must produce the same gradients as
    jax.grad through the pure-XLA mirror gru_stack_ref."""
    from koala_tpu.ops.pallas.gru import gru_stack_ref, gru_stack_trainable

    b, t, h = 8, 6, 128
    cfg = dict(mask_gru.DEFAULT_CONFIG, hidden=h, num_layers=layers)
    params = mask_gru.init_params(jax.random.PRNGKey(5), cfg)
    gru_layers = params["gru"]

    x = jnp.asarray(rng.standard_normal((t, b, h)).astype(np.float32) * 0.3)
    h0 = jnp.asarray(rng.standard_normal((layers, b, h)).astype(np.float32) * 0.2)

    def loss_fused(h0, x, ls):
        y, hf = gru_stack_trainable(h0, x, ls, True)  # interpret mode
        return (jnp.sum(y.astype(jnp.float32) ** 2)
                + jnp.sum(jnp.sin(hf)))

    def loss_ref(h0, x, ls):
        y, hf = gru_stack_ref(h0, x, ls)
        return (jnp.sum(y.astype(jnp.float32) ** 2)
                + jnp.sum(jnp.sin(hf)))

    val_f, grads_f = jax.value_and_grad(loss_fused, argnums=(0, 1, 2))(
        h0, x, gru_layers)
    val_r, grads_r = jax.value_and_grad(loss_ref, argnums=(0, 1, 2))(
        h0, x, gru_layers)

    np.testing.assert_allclose(float(val_f), float(val_r), rtol=1e-5)
    flat_f = jax.tree_util.tree_leaves(grads_f)
    flat_r = jax.tree_util.tree_leaves(grads_r)
    assert len(flat_f) == len(flat_r)
    for gf, gr in zip(flat_f, flat_r):
        np.testing.assert_allclose(np.asarray(gf, np.float32),
                                   np.asarray(gr, np.float32),
                                   atol=1e-3, rtol=1e-3)


def test_trainable_forward_matches_plain_kernel(rng):
    """The custom_vjp primal must be bit-identical to the plain kernel."""
    from koala_tpu.ops.pallas.gru import gru_stack_trainable

    b, t, h, layers = 8, 5, 128, 2
    cfg = dict(mask_gru.DEFAULT_CONFIG, hidden=h, num_layers=layers)
    params = mask_gru.init_params(jax.random.PRNGKey(7), cfg)
    x = jnp.asarray(rng.standard_normal((t, b, h)).astype(np.float32) * 0.3)
    h0 = jnp.zeros((layers, b, h), jnp.float32)

    y0, hf0 = gru_stack_pallas(h0, x, *flatten_layer_params(params["gru"]),
                               interpret=True)
    y1, hf1 = gru_stack_trainable(h0, x, params["gru"], True)
    assert np.array_equal(np.asarray(y0, np.float32), np.asarray(y1, np.float32))
    assert np.array_equal(np.asarray(hf0), np.asarray(hf1))


def test_engine_pallas_flag_forced_on_cpu_interpret(rng):
    """apply_sequence with use_pallas=True on CPU must fall back (auto gate)
    and still produce correct results."""
    from koala_tpu.engine.core import make_engine

    cfg = dict(mask_gru.DEFAULT_CONFIG)  # use_pallas="auto" -> CPU fallback
    engine = make_engine("mask_gru", cfg)
    params = mask_gru.init_params(jax.random.PRNGKey(0))
    hops = jnp.asarray(rng.standard_normal((8, 5, 256)).astype(np.float32) * 0.1)
    state = engine.init_state((8,))
    _, out = engine.sequence(params, state, hops)
    assert out.shape == (8, 5, 256)


def test_trainable_gradients_long_sequence(rng):
    """Long-T gradient parity (T=48): the backward accumulates per-step
    re-linearized contributions in bf16-streamed order; ADVICE r2 flagged
    that only T=6 was covered while accumulation error grows with T."""
    from koala_tpu.ops.pallas.gru import gru_stack_ref, gru_stack_trainable

    b, t, h, layers = 8, 48, 128, 2
    cfg = dict(mask_gru.DEFAULT_CONFIG, hidden=h, num_layers=layers)
    params = mask_gru.init_params(jax.random.PRNGKey(11), cfg)
    gru_layers = params["gru"]

    x = jnp.asarray(rng.standard_normal((t, b, h)).astype(np.float32) * 0.3)
    h0 = jnp.asarray(rng.standard_normal((layers, b, h)).astype(np.float32) * 0.2)

    def loss(fn):
        def f(h0, x, ls):
            y, hf = fn(h0, x, ls)
            return jnp.mean(y.astype(jnp.float32) ** 2) + jnp.mean(hf * hf)
        return f

    fused = loss(lambda h0, x, ls: gru_stack_trainable(h0, x, ls, True))
    ref = loss(gru_stack_ref)
    vf, gf = jax.value_and_grad(fused, argnums=(0, 1, 2))(h0, x, gru_layers)
    vr, gr = jax.value_and_grad(ref, argnums=(0, 1, 2))(h0, x, gru_layers)
    np.testing.assert_allclose(float(vf), float(vr), rtol=1e-5)
    for a, b_ in zip(jax.tree_util.tree_leaves(gf), jax.tree_util.tree_leaves(gr)):
        a = np.asarray(a, np.float32)
        b_ = np.asarray(b_, np.float32)
        denom = max(np.abs(b_).max(), 1e-6)
        assert np.max(np.abs(a - b_)) / denom < 5e-3, denom
