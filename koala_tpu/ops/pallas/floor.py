"""Minimum-statistics floor tracker as a single Pallas TPU kernel.

The floor recurrence (models/mask_gru.py:_floor_update)
    floor[t] = min(floor[t-1] + rise, lb[t])
is elementwise over [B, nb] but strictly sequential over T. As a
lax.scan it costs T tiny XLA loop iterations — each paying loop
bookkeeping and an HBM round-trip for ~64 KB of work — which made it a
disproportionate slice of the engine's non-kernel time (VERDICT r4 #3).
This kernel runs the whole T-step recurrence in ONE pallas_call:

- grid=(T,) sequential; Pallas double-buffers the lb[t] load and the
  floors[t] store against the (trivial) compute;
- the carried floor lives in the aliased final-state output block in VMEM
  across all grid steps (input_output_aliases) — zero recurrence HBM
  traffic beyond the streamed input/output;
- the arithmetic is exactly `min(floor + rise, lb)` in f32, the same op
  order as the scan — results are BIT-IDENTICAL to the lax.scan path, so
  the step/sequence/chunked equivalence contract is preserved
  (tests/test_pallas_floor.py asserts this).

nb (the band count, 32) is below the 128-lane tile width; the blocks are
lane-padded by Mosaic. That wastes VPU lanes, but the whole tensor is tiny
(B*nb f32 = 64 KB/step) — the win is collapsing T launches into one.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(lb_ref, f0_ref, floors_ref, f_ref, *, rise):
    del f0_ref  # aliased into f_ref; already holds floor state at t == 0
    fl = jnp.minimum(f_ref[:] + rise, lb_ref[0])
    f_ref[:] = fl
    floors_ref[0] = fl


@functools.partial(jax.jit, static_argnames=("rise", "interpret"))
def floor_scan_pallas(floor0, lb, rise: float, interpret: bool = False):
    """floor0 [B, nb] f32, lb [T, B, nb] f32 ->
    (floor_final [B, nb], floors [T, B, nb]); identical to
    lax.scan(lambda f, x: (min(f + rise, x),) * 2, floor0, lb)."""
    t_len, b, nb = lb.shape
    outs = pl.pallas_call(
        functools.partial(_kernel, rise=rise),
        grid=(t_len,),
        in_specs=[
            pl.BlockSpec((1, b, nb), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b, nb), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, b, nb), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b, nb), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t_len, b, nb), jnp.float32),
            jax.ShapeDtypeStruct((b, nb), jnp.float32),
        ],
        input_output_aliases={1: 1},     # floor0 -> floor_final
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(lb.astype(jnp.float32), floor0.astype(jnp.float32))
    floors, floor_final = outs
    return floor_final, floors


def floor_scan_ref(floor0, lb, rise: float):
    """lax.scan reference with identical numerics (CPU path / tests)."""
    def f(fl, x):
        fl2 = jnp.minimum(fl + rise, x)
        return fl2, fl2

    return jax.lax.scan(f, floor0, lb)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def floor_scan_trainable(floor0, lb, rise: float, interpret: bool = False):
    """Differentiable fused floor tracker: forward = the Pallas kernel,
    backward = analytic reverse scan over the min-branch indicators (the
    recurrence is piecewise linear, so the vjp needs only which branch each
    step took — recomputed from the streamed floors, no forward replay).
    Training therefore keeps the fused forward (same speedup as inference).
    """
    floor_final, floors = floor_scan_pallas(floor0, lb, rise,
                                            interpret=interpret)
    return floor_final, floors


def _trainable_fwd(floor0, lb, rise, interpret):
    floor_final, floors = floor_scan_pallas(floor0, lb, rise,
                                            interpret=interpret)
    return (floor_final, floors), (floor0, lb, floors)


def _trainable_bwd(rise, interpret, res, cts):
    floor0, lb, floors = res
    ct_final, ct_floors = cts
    f_prev = jnp.concatenate([floor0[None], floors[:-1]], axis=0)
    # Branch indicator per step: True where the rise branch won the min
    # (grad flows to floor[t-1]), False where lb[t] won (grad flows to lb).
    # `<=` matches jnp.minimum's tie convention (ties take the first arg).
    took_rise = (f_prev + rise) <= lb

    def body(a, inp):
        g_t, mask_t = inp
        tot = g_t + a
        return tot * mask_t, tot * (1.0 - mask_t)

    g = ct_floors.at[-1].add(ct_final)
    dfloor0, dlb = jax.lax.scan(body, jnp.zeros_like(floor0),
                                (g, took_rise.astype(g.dtype)), reverse=True)
    return dfloor0, dlb


floor_scan_trainable.defvjp(_trainable_fwd, _trainable_bwd)


__all__ = ["floor_scan_pallas", "floor_scan_ref", "floor_scan_trainable"]
