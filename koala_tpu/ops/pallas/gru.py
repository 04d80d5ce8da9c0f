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


def _kernel(*refs, return_hidden=False):
    # Layout: refs = (x, [wx_l, bx_l, wh_l, bh_l] x L, h0, y, [hs,] h). The
    # layer count is recovered from the count (static at trace time). h is
    # aliased with h0 (input_output_aliases), so it already holds the initial
    # hidden state at t == 0 and carries it across grid steps; the final
    # state is the kernel's last output for free. With return_hidden, the
    # per-step post-update hidden stack is also streamed out (training
    # residuals for the custom_vjp backward — see gru_stack_trainable).
    x_ref = refs[0]
    if return_hidden:
        y_ref, hs_ref, h_ref = refs[-3], refs[-2], refs[-1]
        layer_refs = refs[1:-4]
    else:
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
        if return_hidden:
            hs_ref[0, l] = h_new
        x_f = x_f + h_new                             # residual
        x_bf = x_f.astype(jnp.bfloat16)
    y_ref[0] = x_bf


@functools.partial(jax.jit, static_argnames=("interpret", "return_hidden"))
def gru_stack_pallas(h0, x, *layer_weights, interpret: bool = False,
                     return_hidden: bool = False):
    """Run the fused L-layer GRU recurrence (input projections in-kernel).

    h0: [L, B, H] f32        initial hidden states (layer-major)
    x:  [T, B, H]            layer-0 inputs (encoder output; streamed bf16)
    layer_weights:           wx_0, bx_0, wh_0, bh_0, wx_1, ... (4 per layer;
                             wx/wh [H, 3H] cast to bf16 inside, bx/bh [3H])
    -> (y [T, B, H] bf16, h_final [L, B, H] f32), plus the per-step hidden
    stack hs [T, L, B, H] f32 inserted before h_final when return_hidden
    (training residuals).

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
    ]
    out_shape = [jax.ShapeDtypeStruct((t_len, b, hidden), jnp.bfloat16)]
    if return_hidden:
        out_specs.append(pl.BlockSpec((1, layers, b, hidden),
                                      lambda t: (t, 0, 0, 0),
                                      memory_space=pltpu.VMEM))
        out_shape.append(
            jax.ShapeDtypeStruct((t_len, layers, b, hidden), jnp.float32))
    out_specs.append(pl.BlockSpec((layers, b, hidden), lambda t: (0, 0, 0),
                                  memory_space=pltpu.VMEM))
    out_shape.append(jax.ShapeDtypeStruct((layers, b, hidden), jnp.float32))

    outs = pl.pallas_call(
        functools.partial(_kernel, return_hidden=return_hidden),
        grid=(t_len,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        # alias h0 (last operand) with the h_final output (last index)
        input_output_aliases={h0_index: len(out_shape) - 1},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(*operands)
    return tuple(outs)


def flatten_layer_params(gru_layers):
    """[{wx,bx,wh,bh}] x L -> flat (wx_0, bx_0, wh_0, bh_0, wx_1, ...)."""
    out = []
    for layer in gru_layers:
        out += [layer["wx"], layer["bx"], layer["wh"], layer["bh"]]
    return tuple(out)


def _layers_step(layers, h_prev, x_bf):
    """One time-step through the full stack mirroring _kernel numerics
    exactly (bf16 matmul inputs, f32 accumulation/gates/state, bf16 residual
    stream). layers: sequence of {wx,bx,wh,bh}; h_prev [L,B,H] f32;
    x_bf [B,H] bf16 -> (h_new [L,B,H] f32, y_t [B,H] bf16)."""
    hidden = h_prev.shape[-1]
    x_f = x_bf.astype(jnp.float32)
    xb = x_bf
    new_h = []
    for l, w in enumerate(layers):
        xp = jnp.dot(xb, w["wx"].astype(jnp.bfloat16),
                     preferred_element_type=jnp.float32) + w["bx"]
        hp = jnp.dot(h_prev[l].astype(jnp.bfloat16), w["wh"].astype(jnp.bfloat16),
                     preferred_element_type=jnp.float32) + w["bh"]
        h_new = _gru_gates(h_prev[l], hp, xp, hidden)
        new_h.append(h_new)
        x_f = x_f + h_new
        xb = x_f.astype(jnp.bfloat16)
    return jnp.stack(new_h), xb


def gru_stack_ref(h0, x, layers):
    """Pure-XLA lax.scan mirror of the fused kernel (same numerics). Used as
    the semantic reference in tests and by the custom_vjp backward below."""
    def body(h, x_t):
        h_new, y_t = _layers_step(layers, h, x_t)
        return h_new, y_t

    h_final, y = jax.lax.scan(body, h0.astype(jnp.float32),
                              x.astype(jnp.bfloat16))
    return y, h_final


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def gru_stack_trainable(h0, x, layers, interpret=False):
    """Differentiable fused recurrence: forward = the Pallas kernel,
    backward = analytic reverse-time scan over hidden states the kernel
    streams out as residuals (return_hidden) — no sequential forward
    replay; each step's forward is re-linearized locally from the streamed
    hidden residuals (the O(T) recurrence is never re-run).

    layers is the params["gru"] pytree (list of dicts), so gradients flow to
    the weights; VERDICT round-1 next-step #5 (training previously always
    paid the slow lax.scan forward, train/train.py:58-61).
    """
    y, h_final = gru_stack_pallas(h0, x, *flatten_layer_params(layers),
                                  interpret=interpret)
    return y, h_final


def _trainable_fwd(h0, x, layers, interpret):
    L, b, hidden = h0.shape
    if gru_stack_supported(L, b, hidden, return_hidden=True):
        y, hs, h_final = gru_stack_pallas(
            h0, x, *flatten_layer_params(layers),
            interpret=interpret, return_hidden=True)
    else:
        # Shapes fit the inference kernel but not the training variant's
        # extra hs stream: keep identical numerics via the scan mirror
        # (slower forward, same residuals).
        def body(h, x_t):
            h_new, y_t = _layers_step(layers, h, x_t)
            return h_new, (y_t, h_new)

        h_final, (y, hs) = jax.lax.scan(
            body, h0.astype(jnp.float32), x.astype(jnp.bfloat16))
    return (y, h_final), (h0, x, layers, hs)


def _trainable_bwd(interpret, res, cts):
    h0, x, layers, hs = res
    ct_y, ct_hf = cts
    x_bf = x.astype(jnp.bfloat16)
    # h_prev[t] = hidden stack BEFORE step t: h0 at t=0, else hs[t-1].
    h_prev_seq = jnp.concatenate([h0[None].astype(jnp.float32), hs[:-1]], 0)
    zeros_w = jax.tree_util.tree_map(jnp.zeros_like, layers)

    def body(carry, inp):
        dh, dlayers = carry                      # dh: cot into h_new at t
        h_prev_t, x_t, ct_y_t = inp
        _, vjp_fn = jax.vjp(_layers_step, layers, h_prev_t, x_t)
        dlayers_t, dh_prev, dx_t = vjp_fn((dh, ct_y_t))
        dlayers = jax.tree_util.tree_map(jnp.add, dlayers, dlayers_t)
        return (dh_prev, dlayers), dx_t

    (dh0, dlayers), dx = jax.lax.scan(
        body, (ct_hf.astype(jnp.float32), zeros_w),
        (h_prev_seq, x_bf, ct_y.astype(jnp.bfloat16)), reverse=True)
    return dh0.astype(h0.dtype), dx.astype(x.dtype), dlayers


gru_stack_trainable.defvjp(_trainable_fwd, _trainable_bwd)


def gru_stack_supported(num_layers: int, batch: int, hidden: int,
                        return_hidden: bool = False) -> bool:
    """Shape gate for the fused kernel: MXU/VPU-aligned dims and VMEM
    headroom for the weights + per-step buffers at the given layer count.
    ``return_hidden`` models the TRAINING forward (gru_stack_trainable),
    whose extra double-buffered [1,L,B,H] f32 hs output stream costs
    2*L*B*H*4*2 bytes on top of the inference budget (ADVICE r2: shapes
    near the gate can pass at inference yet OOM when differentiated)."""
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
    if return_hidden:
        vmem += 2 * num_layers * batch * hidden * 4 * 2
    return vmem < 14 * 1024 * 1024


__all__ = [
    "gru_stack_pallas",
    "gru_stack_trainable",
    "gru_stack_ref",
    "gru_stack_supported",
    "flatten_layer_params",
]
