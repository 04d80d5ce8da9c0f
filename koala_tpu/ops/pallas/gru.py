"""Fused GRU-stack recurrence as a single Pallas TPU kernel.

Why: the XLA lax.scan version runs L*T tiny sequential steps, each paying
kernel-launch/HBM-roundtrip overhead for one [B,H]@[H,3H] matmul — at
T=188, L=2 that overhead dominates the whole engine. This kernel runs the
ENTIRE T-step, 2-layer recurrence in ONE pallas_call:

- grid=(T,) with sequential ("arbitrary") semantics; Pallas auto-pipelines
  the per-step HBM load (x1[t]) and store (y[t]) against compute
  (double-buffered DMA).
- hidden state [2,B,H] f32 lives in the aliased h-output block in VMEM for
  the whole kernel (input_output_aliases) — the recurrence itself does
  zero HBM traffic and no init copy.
- BOTH layers' input projections are computed in-kernel. Layer 2's cannot
  be hoisted (its input x2 = x1 + h1 depends on the recurrence); layer 1's
  *could* be precomputed outside, but that materializes a [T,B,3H] f32
  tensor in HBM (456 MB at B=512, T=376) plus a layout transpose and a
  bf16 cast — ~3x more HBM traffic than streaming the [T,B,H] bf16
  encoder output and spending one extra MXU matmul per step. Measured
  end-to-end this trade wins decisively (HBM bandwidth, not MXU, is the
  chunk bottleneck).
- the time-streamed buffers (x1, y) are **bfloat16**: halves both VMEM
  footprint and DMA bandwidth. Gate math and hidden state stay f32;
  weights sit in VMEM as bf16 feeding the MXU with f32 accumulation — the
  same numerics as the XLA path's _mm() up to one bf16 rounding of the
  streamed activations.

Semantics (matches models/mask_gru.py step/_gru_recurrent within bf16
stream rounding):
    h1' = gru(h1, x1[t] @ wx1 + bx1)
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


def _mm_vmem(a_bf16, w_ref, b_ref):
    """MXU matmul against a VMEM-resident bf16 weight, f32 accumulate."""
    return jnp.dot(a_bf16, w_ref[:], preferred_element_type=jnp.float32) + b_ref[:]


def _kernel(x1_ref, wx1_ref, bx1_ref, wh1_ref, bh1_ref, wx2_ref, bx2_ref,
            wh2_ref, bh2_ref, h0_ref, y_ref, h_ref):
    # h_ref is aliased with h0_ref (input_output_aliases), so it already
    # holds the initial hidden state at t == 0 and carries it across grid
    # steps; the final state is the kernel's second output for free.
    hidden = h_ref.shape[-1]
    h1 = h_ref[0]
    h2 = h_ref[1]
    x1 = x1_ref[0]                                    # bf16 [B, H]

    # Three independent matmuls up front (xp1, hp1, hp2) — gives the Mosaic
    # scheduler freedom to keep the MXU busy while the VPU runs gate math.
    xp1 = _mm_vmem(x1, wx1_ref, bx1_ref)
    hp1 = _mm_vmem(h1.astype(jnp.bfloat16), wh1_ref, bh1_ref)
    hp2 = _mm_vmem(h2.astype(jnp.bfloat16), wh2_ref, bh2_ref)

    h1_new = _gru_gates(h1, hp1, xp1, hidden)
    x2 = x1.astype(jnp.float32) + h1_new
    xp2 = _mm_vmem(x2.astype(jnp.bfloat16), wx2_ref, bx2_ref)
    h2_new = _gru_gates(h2, hp2, xp2, hidden)

    h_ref[0] = h1_new
    h_ref[1] = h2_new
    y_ref[0] = (x2 + h2_new).astype(jnp.bfloat16)


@functools.partial(jax.jit, static_argnames=("interpret",))
def gru_stack_pallas(h0, x1, wx1, bx1, wh1, bh1, wx2, bx2, wh2, bh2,
                     interpret: bool = False):
    """Run the fused 2-layer GRU recurrence (input projections in-kernel).

    h0: [2, B, H] f32        initial hidden states (layer-major)
    x1: [T, B, H]            layer-1 inputs (encoder output; streamed bf16)
    wx1/wh1/wx2/wh2: [H, 3H] weights (cast to bf16 inside)
    bx1/bh1/bx2/bh2: [3H] f32
    -> (y [T, B, H] bf16, h_final [2, B, H] f32)
    """
    t_len, b, hidden = x1.shape
    three_h = 3 * hidden
    w_dt = jnp.bfloat16

    def weight_spec():
        return pl.BlockSpec((hidden, three_h), lambda t: (0, 0),
                            memory_space=pltpu.VMEM)

    def bias_spec():
        return pl.BlockSpec((1, three_h), lambda t: (0, 0),
                            memory_space=pltpu.VMEM)

    in_specs = [
        pl.BlockSpec((1, b, hidden), lambda t: (t, 0, 0),
                     memory_space=pltpu.VMEM),
        weight_spec(), bias_spec(),     # wx1, bx1
        weight_spec(), bias_spec(),     # wh1, bh1
        weight_spec(), bias_spec(),     # wx2, bx2
        weight_spec(), bias_spec(),     # wh2, bh2
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
        # alias h0 (10th operand, index 9) with the h_final output (index 1)
        input_output_aliases={9: 1},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(x1.astype(jnp.bfloat16),
      wx1.astype(w_dt), bx1.reshape(1, -1), wh1.astype(w_dt),
      bh1.reshape(1, -1), wx2.astype(w_dt), bx2.reshape(1, -1),
      wh2.astype(w_dt), bh2.reshape(1, -1), h0.astype(jnp.float32))
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
    # VMEM model: 4 x [H,3H] bf16 weights; x1,y streams 2 buffers each of
    # [B,H] bf16; h one aliased in+out block pair [2,B,H] f32; plus ~2 live
    # f32 [B,3H] stack temporaries (xp/hp intermediates; Mosaic reuses the
    # rest in place — validated empirically at B=512, H=384).
    vmem = (4 * hidden * 3 * hidden * 2
            + 4 * batch * hidden * 2
            + 2 * 2 * batch * hidden * 4
            + 2 * batch * 3 * hidden * 4)
    return vmem < 14 * 1024 * 1024


__all__ = ["gru_stack_pallas", "gru_stack_supported"]
