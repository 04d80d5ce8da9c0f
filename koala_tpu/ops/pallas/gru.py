"""Fused GRU-stack recurrence as a single Pallas TPU kernel.

Why: the XLA lax.scan version runs L*T tiny sequential steps, each paying
kernel-launch/HBM-roundtrip overhead for one [B,H]@[H,3H] matmul — at
T=188, L=2 that overhead dominates the whole engine. This kernel runs the
ENTIRE T-step, 2-layer recurrence in ONE pallas_call:

- grid=(T,) with sequential ("arbitrary") semantics; Pallas auto-pipelines
  the per-step HBM loads (xp1[t], x1[t]) and stores (y[t]) against
  compute (double-buffered DMA).
- hidden state [2,B,H] f32 lives in the aliased h-output block in VMEM for
  the whole kernel (input_output_aliases) — the recurrence itself does
  zero HBM traffic and no init copy.
- the time-streamed buffers (xp1, x1, y) are **bfloat16**: halves both
  VMEM footprint (the f32 variant OOMs 16 MB VMEM at B=512) and DMA
  bandwidth. Gate math stays f32; weights sit in VMEM as bf16 feeding the
  MXU with f32 accumulation — the same numerics as the XLA path's _mm()
  up to one bf16 rounding of the streamed activations.

Layer-2's input projection cannot be hoisted (its input x2 = x1 + h1
depends on the recurrence), so the kernel computes it in-place — exactly
the fusion XLA cannot do across scan iterations.

Semantics (matches models/mask_gru.py step/_gru_recurrent within bf16
stream rounding):
    h1' = gru(h1, xp1[t])            xp1 = x1 @ wx1 + bx1 (precomputed)
    x2  = x1[t] + h1'
    h2' = gru(h2, x2 @ wx2 + bx2)
    y[t] = x2 + h2'
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _gru_gates(h, hp, xp, hidden):
    """Shared gate math in f32: h [B,H], hp/xp [B,3H] -> new h [B,H]."""
    hz, hr, hn = hp[:, :hidden], hp[:, hidden:2 * hidden], hp[:, 2 * hidden:]
    xz, xr, xn = xp[:, :hidden], xp[:, hidden:2 * hidden], xp[:, 2 * hidden:]
    z = jax.nn.sigmoid(xz + hz)
    r = jax.nn.sigmoid(xr + hr)
    n = jnp.tanh(xn + r * hn)
    return (1.0 - z) * n + z * h


def _kernel(xp1_ref, x1_ref, wh1_ref, bh1_ref, wx2_ref, bx2_ref,
            wh2_ref, bh2_ref, h0_ref, y_ref, h_ref):
    # h_ref is aliased with h0_ref (input_output_aliases), so it already
    # holds the initial hidden state at t == 0 and carries it across grid
    # steps; the final state is the kernel's second output for free.
    hidden = h_ref.shape[-1]
    h1 = h_ref[0]
    h2 = h_ref[1]

    # layer 1: hoisted input projection streamed in (bf16), recurrent
    # matmul here
    hp1 = jnp.dot(h1.astype(jnp.bfloat16), wh1_ref[:],
                  preferred_element_type=jnp.float32) + bh1_ref[:]
    xp1 = xp1_ref[0].astype(jnp.float32)
    h1_new = _gru_gates(h1, hp1, xp1, hidden)

    # layer 2: input projection computed in-kernel (depends on h1)
    x2 = x1_ref[0].astype(jnp.float32) + h1_new
    xp2 = jnp.dot(x2.astype(jnp.bfloat16), wx2_ref[:],
                  preferred_element_type=jnp.float32) + bx2_ref[:]
    hp2 = jnp.dot(h2.astype(jnp.bfloat16), wh2_ref[:],
                  preferred_element_type=jnp.float32) + bh2_ref[:]
    h2_new = _gru_gates(h2, hp2, xp2, hidden)

    h_ref[0] = h1_new
    h_ref[1] = h2_new
    y_ref[0] = (x2 + h2_new).astype(jnp.bfloat16)


@functools.partial(jax.jit, static_argnames=("interpret",))
def gru_stack_pallas(h0, xp1, x1, wh1, bh1, wx2, bx2, wh2, bh2,
                     interpret: bool = False):
    """Run the fused 2-layer GRU recurrence.

    h0: [2, B, H] f32      initial hidden states (layer-major)
    xp1: [T, B, 3H]        layer-1 input projections (x1 @ wx1 + bx1)
    x1: [T, B, H]          layer-1 inputs (encoder output)
    wh1/wx2/wh2: [H, 3H]   weights (cast to bf16 inside)
    bh1/bx2/bh2: [3H] f32
    -> (y [T, B, H] bf16, h_final [2, B, H] f32)
    """
    t_len, b, three_h = xp1.shape
    hidden = three_h // 3
    w_dt = jnp.bfloat16

    in_specs = [
        pl.BlockSpec((1, b, three_h), lambda t: (t, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, b, hidden), lambda t: (t, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((hidden, three_h), lambda t: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, three_h), lambda t: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((hidden, three_h), lambda t: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, three_h), lambda t: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((hidden, three_h), lambda t: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, three_h), lambda t: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((2, b, hidden), lambda t: (0, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_specs = [
        pl.BlockSpec((1, b, hidden), lambda t: (t, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((2, b, hidden), lambda t: (0, 0, 0),
                     memory_space=pltpu.VMEM),
    ]

    y, h_final = pl.pallas_call(
        _kernel,
        grid=(t_len,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=[
            jax.ShapeDtypeStruct((t_len, b, hidden), jnp.bfloat16),
            jax.ShapeDtypeStruct((2, b, hidden), jnp.float32),
        ],
        # alias h0 (9th operand, index 8) with the h_final output (index 1)
        input_output_aliases={8: 1},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(xp1.astype(jnp.bfloat16), x1.astype(jnp.bfloat16),
      wh1.astype(w_dt), bh1.reshape(1, -1), wx2.astype(w_dt),
      bx2.reshape(1, -1), wh2.astype(w_dt), bh2.reshape(1, -1),
      h0.astype(jnp.float32))
    return y, h_final


def gru_stack_supported(num_layers: int, batch: int, hidden: int) -> bool:
    """Shape gate for the fused kernel: 2 layers, MXU/VPU-aligned dims,
    and VMEM headroom for the per-step buffers."""
    if num_layers != 2:
        return False
    if batch < 8 or batch % 8 != 0 or batch > 512:
        return False          # >512 validated to exceed VMEM at H=384
    if hidden % 128 != 0:
        return False
    # VMEM model (bf16 streams, double-buffered; f32 aliased h block):
    #   weights 3 x [H,3H] bf16; xp1 2 x [B,3H] bf16; x1,y 2 x [B,H] bf16
    #   each; h 2 x [2,B,H] f32 (aliased in+out block pair).
    vmem = (3 * hidden * 3 * hidden * 2
            + 2 * batch * 3 * hidden * 2
            + 4 * batch * hidden * 2
            + 2 * 2 * batch * hidden * 4)
    return vmem < 14 * 1024 * 1024


__all__ = ["gru_stack_pallas", "gru_stack_supported"]
