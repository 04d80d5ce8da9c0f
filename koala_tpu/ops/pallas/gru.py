"""Fused GRU-stack recurrence as a single Pallas TPU kernel.

Why: the XLA lax.scan version runs L*T tiny sequential steps, each paying
kernel-launch/HBM-roundtrip overhead for one [B,H]@[H,3H] matmul — at
T=188, L=2 that overhead dominates the whole engine (measured: the scan is
~2/3 of sequence-mode wall time). This kernel runs the ENTIRE T-step,
2-layer recurrence in ONE pallas_call:

- grid=(T,) with sequential ("arbitrary") semantics; Pallas auto-pipelines
  the per-step HBM loads (xproj1[t], x1[t]) and stores (y[t]) against
  compute (double-buffered DMA).
- hidden states h1, h2 live in a VMEM scratch buffer that persists across
  grid steps — zero HBM traffic for the recurrence itself.
- weights sit in VMEM as bf16; matmuls run on the MXU with f32 accumulate
  (same numerics as the XLA path's _mm()).

Layer-2's input projection cannot be hoisted (its input x2 = x1 + h1
depends on the recurrence), so the kernel computes it in-place — that is
exactly the fusion XLA cannot do across scan iterations.

Semantics (must match models/mask_gru.py step/_gru_recurrent):
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
    """Shared gate math: h [B,H] f32, hp/xp [B,3H] f32 -> new h [B,H]."""
    hz, hr, hn = hp[:, :hidden], hp[:, hidden:2 * hidden], hp[:, 2 * hidden:]
    xz, xr, xn = xp[:, :hidden], xp[:, hidden:2 * hidden], xp[:, 2 * hidden:]
    z = jax.nn.sigmoid(xz + hz)
    r = jax.nn.sigmoid(xr + hr)
    n = jnp.tanh(xn + r * hn)
    return (1.0 - z) * n + z * h


def _kernel(xp1_ref, x1_ref, wh1_ref, bh1_ref, wx2_ref, bx2_ref,
            wh2_ref, bh2_ref, h0_ref, y_ref, hout_ref, h_scratch):
    t = pl.program_id(0)
    num_t = pl.num_programs(0)
    hidden = h0_ref.shape[-1]

    @pl.when(t == 0)
    def _():
        h_scratch[:] = h0_ref[:]

    h1 = h_scratch[0]
    h2 = h_scratch[1]

    # layer 1: hoisted input projection streamed in, recurrent matmul here
    hp1 = jnp.dot(h1.astype(jnp.bfloat16), wh1_ref[:],
                  preferred_element_type=jnp.float32) + bh1_ref[:]
    h1_new = _gru_gates(h1, hp1, xp1_ref[0], hidden)

    # layer 2: input projection computed in-kernel (depends on h1)
    x2 = x1_ref[0] + h1_new
    xp2 = jnp.dot(x2.astype(jnp.bfloat16), wx2_ref[:],
                  preferred_element_type=jnp.float32) + bx2_ref[:]
    hp2 = jnp.dot(h2.astype(jnp.bfloat16), wh2_ref[:],
                  preferred_element_type=jnp.float32) + bh2_ref[:]
    h2_new = _gru_gates(h2, hp2, xp2, hidden)

    h_scratch[0] = h1_new
    h_scratch[1] = h2_new
    y_ref[0] = x2 + h2_new

    @pl.when(t == num_t - 1)
    def _():
        hout_ref[:] = h_scratch[:]


@functools.partial(jax.jit, static_argnames=("interpret",))
def gru_stack_pallas(h0, xp1, x1, wh1, bh1, wx2, bx2, wh2, bh2,
                     interpret: bool = False):
    """Run the fused 2-layer GRU recurrence.

    h0: [2, B, H] f32      initial hidden states (layer-major)
    xp1: [T, B, 3H] f32    layer-1 input projections (x1 @ wx1 + bx1)
    x1: [T, B, H] f32      layer-1 inputs (encoder output)
    wh1/wx2/wh2: [H, 3H]   weights (cast to bf16 inside)
    bh1/bx2/bh2: [3H] f32
    -> (y [T, B, H] f32, h_final [2, B, H] f32)
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
            jax.ShapeDtypeStruct((t_len, b, hidden), jnp.float32),
            jax.ShapeDtypeStruct((2, b, hidden), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((2, b, hidden), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(xp1, x1, wh1.astype(w_dt), bh1.reshape(1, -1), wx2.astype(w_dt),
      bx2.reshape(1, -1), wh2.astype(w_dt), bh2.reshape(1, -1), h0)
    return y, h_final


def gru_stack_supported(num_layers: int, batch: int, hidden: int) -> bool:
    """Shape gate for the fused kernel: 2 layers, MXU/VPU-aligned dims,
    and VMEM headroom for the per-step buffers."""
    if num_layers != 2:
        return False
    if batch < 8 or batch % 8 != 0:
        return False
    if hidden % 128 != 0:
        return False
    # VMEM budget (f32 buffers, double-buffered pipeline):
    #   weights: 3 x [H,3H] bf16
    #   xp1: 2 slots x [B,3H] f32      x1, y: 2 slots x [B,H] f32 each
    #   h scratch: [2,B,H] f32         h0/hout blocks: 2 x [2,B,H] f32
    vmem = (3 * hidden * 3 * hidden * 2
            + 2 * batch * 3 * hidden * 4
            + 4 * batch * hidden * 4
            + 3 * 2 * batch * hidden * 4)
    # 16 MB/core VMEM; B=512/H=384 (~15.2 MB by this model) is validated
    # on hardware, so the cap sits just above it.
    return vmem < 15_600_000


__all__ = ["gru_stack_pallas", "gru_stack_supported"]
