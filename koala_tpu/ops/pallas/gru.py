"""Fused GRU-stack recurrence as a single Pallas TPU kernel.

Why: the XLA lax.scan version runs L*T tiny sequential steps, each paying
kernel-launch/HBM-roundtrip overhead for one [B,H]@[H,3H] matmul — at
T=188, L=2 that overhead dominates the whole engine. This kernel runs the
ENTIRE T-step, L-layer recurrence in ONE pallas_call:

- grid=(T,) with sequential ("arbitrary") semantics; Pallas auto-pipelines
  the per-step HBM load (x[t]) and store (y[t]) against compute
  (double-buffered DMA).
- hidden state [L,B,H] f32 lives in the aliased h-output block in VMEM for
  the whole kernel (input_output_aliases) — the recurrence itself does
  zero HBM traffic and no init copy.
- ALL layers' input projections are computed in-kernel. Layer l>0's cannot
  be hoisted (its input x_l = x_{l-1} + h_{l-1}' depends on the
  recurrence); layer 0's *could* be precomputed outside, but that
  materializes a [T,B,3H] f32 tensor in HBM (456 MB at B=512, T=376) plus
  a layout transpose and a bf16 cast — ~3x more HBM traffic than streaming
  the [T,B,H] bf16 encoder output and spending one extra MXU matmul per
  step. Measured end-to-end this trade wins decisively (HBM bandwidth, not
  MXU, is the chunk bottleneck).
- the time-streamed buffers (x, y) are **bfloat16**: halves both VMEM
  footprint and DMA bandwidth. Gate math and hidden state stay f32;
  weights sit in VMEM as bf16 feeding the MXU with f32 accumulation — the
  same numerics as the XLA path's _mm() up to one bf16 rounding of the
  streamed activations.

Semantics (matches models/mask_gru.py step/_gru_recurrent within bf16
stream rounding), with x_0 = x[t]:
    for l in 0..L-1:
        h_l' = gru(h_l, x_l @ wx[l] + bx[l])
        x_{l+1} = x_l + h_l'
    y[t] = x_L

The layer count is STATIC (one wx/bx/wh/bh operand quadruple per layer);
the in-kernel layer loop unrolls at trace time, so one kernel source serves
any L >= 1 within the VMEM budget (gru_stack_supported).
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


def _kernel(*refs):
    # Layout: refs = (x, [wx_l, bx_l, wh_l, bh_l] x L, h0, y, h). The layer
    # count is recovered from the count (static at trace time). h is aliased
    # with h0 (input_output_aliases), so it already holds the initial hidden
    # state at t == 0 and carries it across grid steps; the final state is
    # the kernel's second output for free.
    x_ref = refs[0]
    y_ref, h_ref = refs[-2], refs[-1]
    layer_refs = refs[1:-3]
    layers = len(layer_refs) // 4
    hidden = h_ref.shape[-1]
    x_bf = x_ref[0]                                   # bf16 [B, H]
    x_f = x_bf.astype(jnp.float32)

    # All recurrent projections (hp_l from the PRE-step hidden states) are
    # issued up front — they are independent of each other and of the
    # layer-0 input projection, which gives the Mosaic scheduler freedom
    # to keep the MXU busy while the VPU runs gate math.
    hs = [h_ref[l] for l in range(layers)]
    hps = [
        jnp.dot(hs[l].astype(jnp.bfloat16), layer_refs[4 * l + 2][:],
                preferred_element_type=jnp.float32) + layer_refs[4 * l + 3][:]
        for l in range(layers)
    ]
    for l in range(layers):
        xp = (jnp.dot(x_bf, layer_refs[4 * l][:],
                      preferred_element_type=jnp.float32)
              + layer_refs[4 * l + 1][:])
        h_new = _gru_gates(hs[l], hps[l], xp, hidden)
        h_ref[l] = h_new
        x_f = x_f + h_new                             # residual
        x_bf = x_f.astype(jnp.bfloat16)
    y_ref[0] = x_bf


@functools.partial(jax.jit, static_argnames=("interpret",))
def gru_stack_pallas(h0, x, *layer_weights, interpret: bool = False):
    """Run the fused L-layer GRU recurrence (input projections in-kernel).

    h0: [L, B, H] f32        initial hidden states (layer-major)
    x:  [T, B, H]            layer-0 inputs (encoder output; streamed bf16)
    layer_weights:           wx_0, bx_0, wh_0, bh_0, wx_1, ... (4 per layer;
                             wx/wh [H, 3H] cast to bf16 inside, bx/bh [3H])
    -> (y [T, B, H] bf16, h_final [L, B, H] f32)

    Weights are passed per-layer (not stacked [L, ...]) on purpose: stacking
    materializes a multi-MB concatenate on every call and the stacked-block
    slicing lowers worse in Mosaic — measured ~35% slower end-to-end.
    """
    t_len, b, hidden = x.shape
    layers = h0.shape[0]
    assert len(layer_weights) == 4 * layers, "need wx,bx,wh,bh per layer"
    three_h = 3 * hidden

    def weight_spec():
        return pl.BlockSpec((hidden, three_h), lambda t: (0, 0),
                            memory_space=pltpu.VMEM)

    def bias_spec():
        return pl.BlockSpec((1, three_h), lambda t: (0, 0),
                            memory_space=pltpu.VMEM)

    in_specs = [pl.BlockSpec((1, b, hidden), lambda t: (t, 0, 0),
                             memory_space=pltpu.VMEM)]
    operands = [x.astype(jnp.bfloat16)]
    for l in range(layers):
        wx, bx, wh, bh = layer_weights[4 * l:4 * l + 4]
        in_specs += [weight_spec(), bias_spec(), weight_spec(), bias_spec()]
        operands += [wx.astype(jnp.bfloat16), bx.reshape(1, -1),
                     wh.astype(jnp.bfloat16), bh.reshape(1, -1)]
    in_specs.append(pl.BlockSpec((layers, b, hidden), lambda t: (0, 0, 0),
                                 memory_space=pltpu.VMEM))
    operands.append(h0.astype(jnp.float32))
    h0_index = len(operands) - 1

    out_specs = [
        pl.BlockSpec((1, b, hidden), lambda t: (t, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((layers, b, hidden), lambda t: (0, 0, 0),
                     memory_space=pltpu.VMEM),
    ]

    y, h_final = pl.pallas_call(
        _kernel,
        grid=(t_len,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=[
            jax.ShapeDtypeStruct((t_len, b, hidden), jnp.bfloat16),
            jax.ShapeDtypeStruct((layers, b, hidden), jnp.float32),
        ],
        # alias h0 (last operand) with the h_final output (index 1)
        input_output_aliases={h0_index: 1},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(*operands)
    return y, h_final


def flatten_layer_params(gru_layers):
    """[{wx,bx,wh,bh}] x L -> flat (wx_0, bx_0, wh_0, bh_0, wx_1, ...)."""
    out = []
    for layer in gru_layers:
        out += [layer["wx"], layer["bx"], layer["wh"], layer["bh"]]
    return tuple(out)


def gru_stack_supported(num_layers: int, batch: int, hidden: int) -> bool:
    """Shape gate for the fused kernel: MXU/VPU-aligned dims and VMEM
    headroom for the weights + per-step buffers at the given layer count."""
    if num_layers < 1:
        return False
    if batch < 8 or batch % 8 != 0:
        return False
    if hidden % 128 != 0:
        return False
    # VMEM model: 2L x [H,3H] bf16 weights; x,y streams 2 buffers each of
    # [B,H] bf16; h one aliased in+out block pair [L,B,H] f32; plus ~L live
    # f32 [B,3H] stack temporaries (the hoisted hp_l list; Mosaic reuses
    # xp and the rest in place — validated empirically at B=512, H=384,
    # L=2, where the budget sits at 12.4 MiB and the kernel runs).
    vmem = (2 * num_layers * hidden * 3 * hidden * 2
            + 4 * batch * hidden * 2
            + 2 * num_layers * batch * hidden * 4
            + num_layers * batch * 3 * hidden * 4)
    return vmem < 14 * 1024 * 1024


__all__ = ["gru_stack_pallas", "gru_stack_supported", "flatten_layer_params"]
