"""Fused Pallas floor-tracker kernel vs the lax.scan reference
(interpret mode on CPU): bit-exact forward, matching gradients."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from koala_tpu.ops.pallas.floor import (
    floor_scan_pallas,
    floor_scan_ref,
    floor_scan_trainable,
)

RISE = 0.012


def _inputs(rng, t=23, b=16, nb=32):
    lb = jnp.asarray(rng.standard_normal((t, b, nb)).astype(np.float32) * 3.0)
    floor0 = jnp.full((b, nb), 30.0, jnp.float32)
    return floor0, lb


def test_kernel_bit_identical_to_scan(rng):
    floor0, lb = _inputs(rng)
    ref_final, ref_floors = floor_scan_ref(floor0, lb, RISE)
    final, floors = floor_scan_pallas(floor0, lb, RISE, interpret=True)
    np.testing.assert_array_equal(np.asarray(floors), np.asarray(ref_floors))
    np.testing.assert_array_equal(np.asarray(final), np.asarray(ref_final))


def test_kernel_chunked_equals_continuous(rng):
    """Carrying floor_final across two kernel calls == one long call —
    the serving chunked-dispatch contract."""
    floor0, lb = _inputs(rng, t=20)
    _, ref_floors = floor_scan_pallas(floor0, lb, RISE, interpret=True)
    mid, floors_a = floor_scan_pallas(floor0, lb[:11], RISE, interpret=True)
    _, floors_b = floor_scan_pallas(mid, lb[11:], RISE, interpret=True)
    np.testing.assert_array_equal(
        np.asarray(jnp.concatenate([floors_a, floors_b], axis=0)),
        np.asarray(ref_floors))


def test_trainable_gradients_match_scan(rng):
    floor0, lb = _inputs(rng, t=17, b=8)

    def loss_kernel(f0, x):
        final, floors = floor_scan_trainable(f0, x, RISE, True)
        return jnp.sum(jnp.sin(floors)) + 2.0 * jnp.sum(final)

    def loss_ref(f0, x):
        final, floors = floor_scan_ref(f0, x, RISE)
        return jnp.sum(jnp.sin(floors)) + 2.0 * jnp.sum(final)

    gk = jax.grad(loss_kernel, argnums=(0, 1))(floor0, lb)
    gr = jax.grad(loss_ref, argnums=(0, 1))(floor0, lb)
    for a, b in zip(gk, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-6)
