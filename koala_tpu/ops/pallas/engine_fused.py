"""The whole enhancement engine as ONE fused Pallas TPU kernel.

Motivation (round 5): after the GRU recurrence was fused (gru.py) and the
floor tracker was fused (floor.py), the sequence engine still spent ~10 ms
of a 16 ms B=512/T=376 chunk OUTSIDE the kernels — materializing the
[B,T,512] frame tensor, the [B,T,2*257] spectrum, the feature stack and
the synthesis frames in HBM between XLA fusions (measured ~460 GB/s
effective HBM on the chip; the non-kernel path is bandwidth-bound). This
kernel runs the ENTIRE chain

    frame -> windowed rDFT -> log-mag/SNR-floor/cepstral features ->
    encoder -> L-layer GRU -> decoder mask + passthrough gate ->
    masked iDFT -> overlap-add

inside one pallas_call. HBM traffic collapses to: audio hops in (bf16),
enhanced hops out (f32), weights once. Everything else — spectra,
features, masks, synthesis frames, ALL per-stream state (GRU hiddens,
noise floor, frame carry, OLA tail) — lives in VMEM for the whole chunk.

Structure:
- grid = (B / b_tile, T / 8): the batch is tiled so each tile's state +
  temporaries fit VMEM (~16 MB/core); 8 hops are processed per grid step
  in the model's native [B, T, 256] layout — a [b_tile, 8, 256] block is
  Mosaic-aligned (8 sublanes x 256 lanes), so the kernel streams hops
  with NO layout transposes anywhere, and the 8-step unroll gives the
  scheduler a window of independent matmuls (hop k+1's analysis DFT can
  overlap hop k's recurrence) while cutting grid overhead 8x.
- per-stream state blocks (h, floor, carry, ola) are input_output_aliased
  and indexed by the batch-tile grid coordinate only, so they persist in
  VMEM across the whole T sweep of a tile and are written back once.
- lane padding, not gathers: the 257-bin spectrum lives in 384 padded
  lanes (re) + 384 (im); the encoder's 329-row weight matrix is split by
  feature group into zero-row-padded [384,H]/[128,H]/[128,H]/[8,H]
  blocks so each feature group enters via its own matmul and the unpadded
  concat never exists. Padded bins carry exactly-zero basis columns and
  zero weight rows, so they never influence real outputs.
- numerics: bf16 MXU everywhere with f32 accumulation (the model's
  compute_dtype contract), f32 gate math / state / overlap-add. The DFT
  bases are bf16 in-kernel (vs f32 on the XLA path): the ~0.4% relative
  spectral rounding sits ~45 dB below signal — measured quality-neutral
  (DESIGN.md §1) — so this path is the OFFLINE/batch engine (bench, batch
  demo, corpus wash); the serving/step paths keep the shared XLA
  formulation and its cross-path LSB agreement. CPU acceptance gates are
  unaffected (jax CPU backend never engages this kernel).

Reference parity note: the reference engine is one opaque native call per
frame (pv_koala_process, include/pv_koala.h:66-80); this kernel is the
TPU-native analog of that "whole engine in one launch" shape, at batch
scale.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...constants import FFT_SIZE, FRAME_LENGTH, NUM_BINS
from .gru import _gru_gates

T_BLOCK = 8          # hops per grid step (Mosaic sublane alignment)
KPAD = 384           # lane-padded bin count (257 -> 3 x 128)
KPAD_IM = 256        # im lanes: bins 0..255 — the im Nyquist bin is
                     # IDENTICALLY zero (-sin(pi*n) == 0), so dropping its
                     # lane block is exact and shrinks the forward basis to
                     # [512, KPAD+KPAD_IM] and the im-inverse to [256, 512]
NBPAD = 128          # lane-padded tracker band count (32 -> 128)
CEP_LAGS_PAD = 256   # lane-padded cepstral lag count (161 -> 2 x 128)


@functools.lru_cache(maxsize=4)
def _np_constants(bins: int, nb: int, cep: int):
    """All fixed bases, lane-padded, built once in float64/numpy.

    Returns dict of numpy arrays:
      dft_fwd [512, 2*KPAD]   window-folded forward basis, cols 0..256 re,
                              KPAD..KPAD+256 im, zero elsewhere
      inv_re, inv_im [KPAD, 512] window-folded inverse bases (zero pad rows)
      band [KPAD, NBPAD]      mel band pooling (zero pad rows/cols)
      cepb [KPAD, CEP_LAGS_PAD] real-cepstrum basis over pitch lags
      cmask [cep, CEP_LAGS_PAD] 1/0 group-membership masks for the maxima
    """
    from ...models.mask_gru import _band_matrix_np, _cep_matrix_np
    from ...ops.stft import _windowed_bases

    fwd, inv_re, inv_im = _windowed_bases(FFT_SIZE)       # [512,514],[257,512]
    k = bins
    dft_fwd = np.zeros((FFT_SIZE, KPAD + KPAD_IM), np.float32)
    dft_fwd[:, :k] = fwd[:, :k]
    dft_fwd[:, KPAD:KPAD + KPAD_IM] = fwd[:, k:k + KPAD_IM]
    # im Nyquist basis = -sin(pi*n)*w: zero in exact math; float pi leaves
    # ~1e-12 residue, far below the kernel's bf16 rounding (~1e-2 relative)
    assert np.max(np.abs(fwd[:, k + KPAD_IM:])) < 1e-6
    inv_re_p = np.zeros((KPAD, FFT_SIZE), np.float32)
    inv_re_p[:k] = inv_re
    inv_im_p = np.zeros((KPAD_IM, FFT_SIZE), np.float32)
    inv_im_p[:KPAD_IM] = inv_im[:KPAD_IM]
    assert np.max(np.abs(inv_im[KPAD_IM:])) < 1e-6       # Nyquist row ~ 0

    band = np.zeros((KPAD, NBPAD), np.float32)
    band[:k, :nb] = _band_matrix_np(bins, nb)

    cepb = np.zeros((KPAD, CEP_LAGS_PAD), np.float32)
    cmask = np.zeros((max(cep, 1), CEP_LAGS_PAD), np.float32)
    if cep:
        basis, bounds = _cep_matrix_np(bins, cep)         # [257,161], slices
        cepb[:k, :basis.shape[1]] = basis
        for g, (lo, hi) in enumerate(bounds):
            cmask[g, lo:hi] = 1.0
    return {"dft_fwd": dft_fwd, "inv_re": inv_re_p, "inv_im": inv_im_p,
            "band": band, "cepb": cepb, "cmask": cmask}


def _kernel(*refs, layers, cep, cfg):
    """One grid step: T_BLOCK hops for one batch tile, full engine chain."""
    (hops_ref, dftt_ref, dftb_ref, invr_ref, invi_ref, band_ref, cepb_ref,
     cmask_ref, w1_ref, w2_ref, w3_ref, wcep_ref, benc_ref) = refs[:13]
    lrefs = refs[13:13 + 4 * layers]
    (wdec_ref, bdec_ref, wg_ref, bg_ref,
     carry0, ola0, floor0, h0,
     out_ref, carry_ref, ola_ref, floor_ref, h_ref) = refs[13 + 4 * layers:]
    del carry0, ola0, floor0, h0       # aliased into the *_ref state outputs

    eps2 = np.float32(cfg["feat_eps"]) ** 2
    rise = np.float32(cfg["floor_rise"])
    hidden = cfg["hidden"]

    carry = carry_ref[...]                                 # [b, 256] bf16
    for t in range(T_BLOCK):
        hop = hops_ref[:, t, :]                            # [b, 256] bf16
        # split-K DFT: frame = [carry | hop], so frame @ basis ==
        # carry @ basis[:256] + hop @ basis[256:] — the concat itself
        # never exists (Mosaic cannot concat a sublane-offset hop slice)
        spec = (jnp.dot(carry, dftt_ref[...],
                        preferred_element_type=jnp.float32)
                + jnp.dot(hop, dftb_ref[...],
                          preferred_element_type=jnp.float32))  # [b, KPAD+256]
        re, im = spec[:, :KPAD], spec[:, KPAD:]
        im2 = im * im                                      # [b, 256]
        mag2 = re * re + jnp.concatenate(
            [im2, jnp.zeros_like(im2[:, :KPAD - KPAD_IM])], axis=-1)
        logmag = 0.5 * jnp.log(mag2 + eps2)
        feat = ((logmag + cfg["feat_shift"]) * cfg["feat_scale"])

        # posterior-SNR + absolute-floor tracker features
        lb = jnp.log(jnp.dot(mag2.astype(jnp.bfloat16), band_ref[...],
                             preferred_element_type=jnp.float32) + eps2)
        floor = jnp.minimum(floor_ref[...] + rise, lb)     # [b, NBPAD] f32
        floor_ref[...] = floor
        snr = jnp.clip((lb - floor) * cfg["snr_scale"], 0.0, cfg["snr_clip"])
        lvl = (floor + 9.0) * 0.15

        enc = (jnp.dot(feat.astype(jnp.bfloat16), w1_ref[...],
                       preferred_element_type=jnp.float32)
               + jnp.dot(snr.astype(jnp.bfloat16), w2_ref[...],
                         preferred_element_type=jnp.float32)
               + jnp.dot(lvl.astype(jnp.bfloat16), w3_ref[...],
                         preferred_element_type=jnp.float32)
               + benc_ref[0])
        if cep:
            # cepstral-peak harmonicity features: group maxima enter the
            # encoder as rank-1 contributions (no sub-lane-width tensors)
            c = jnp.dot(logmag.astype(jnp.bfloat16), cepb_ref[...],
                        preferred_element_type=jnp.float32)  # [b, lags]
            for g in range(cep):
                mg = jnp.max(jnp.where(cmask_ref[g][None, :] > 0, c, -1e30),
                             axis=1, keepdims=True)          # [b, 1]
                cg = jnp.clip(mg * cfg["cep_scale"], -1.0, 4.0)
                enc = enc + cg * wcep_ref[g][None, :]

        x_f = jax.nn.gelu(enc)                             # [b, H] f32
        x_bf = x_f.astype(jnp.bfloat16)
        for l in range(layers):
            wx, bx, wh, bh = lrefs[4 * l:4 * l + 4]
            h_prev = h_ref[l]
            hp = jnp.dot(h_prev.astype(jnp.bfloat16), wh[...],
                         preferred_element_type=jnp.float32) + bh[0]
            xp = jnp.dot(x_bf, wx[...],
                         preferred_element_type=jnp.float32) + bx[0]
            h_new = _gru_gates(h_prev, hp, xp, hidden)
            h_ref[l] = h_new
            x_f = x_f + h_new
            x_bf = x_f.astype(jnp.bfloat16)

        mask = jax.nn.sigmoid(jnp.dot(x_bf, wdec_ref[...],
                                      preferred_element_type=jnp.float32)
                              + bdec_ref[0])               # [b, KPAD]
        g128 = jax.nn.sigmoid(jnp.dot(x_bf, wg_ref[...],
                                      preferred_element_type=jnp.float32)
                              + bg_ref[0])                 # [b, 128] (equal cols)
        gate = jnp.concatenate([g128] * (KPAD // 128), axis=-1)
        mask = mask + gate * (1.0 - mask)

        mre = (re * mask).astype(jnp.bfloat16)
        mim = (im * mask[:, :KPAD_IM]).astype(jnp.bfloat16)
        synth = (jnp.dot(mre, invr_ref[...],
                         preferred_element_type=jnp.float32)
                 + jnp.dot(mim, invi_ref[...],
                           preferred_element_type=jnp.float32))  # [b, 512]
        out_ref[:, t, :] = synth[:, :FRAME_LENGTH] + ola_ref[...]
        ola_ref[...] = synth[:, FRAME_LENGTH:]
        carry = hop
    carry_ref[...] = carry


def _prep_weights(params, cfg):
    """Split + lane-pad the model weights into the kernel's operand set."""
    bins, nb = cfg["bins"], cfg["snr_bands"]
    cep = cfg.get("cep_feats") or 0
    h = cfg["hidden"]
    enc_w = params["enc"]["w"]

    def pad_rows(w, rows):
        return jnp.zeros((rows, h), w.dtype).at[:w.shape[0]].set(w)

    w1 = pad_rows(enc_w[:bins], KPAD)
    w2 = pad_rows(enc_w[bins:bins + nb], NBPAD)
    w3 = pad_rows(enc_w[bins + nb:bins + 2 * nb], NBPAD)
    wcep = (enc_w[bins + 2 * nb:bins + 2 * nb + cep] if cep
            else jnp.zeros((1, h), jnp.float32))
    benc = params["enc"]["b"].reshape(1, -1)

    dec_w = params["dec"]["w"]                 # [H, bins]
    wdec = jnp.zeros((h, KPAD), dec_w.dtype).at[:, :bins].set(dec_w)
    # padded mask lanes: bias -30 => sigmoid ~ 0; the gate blend then sets
    # them to g, but their re/im are exactly 0, so nothing leaks through.
    bdec = jnp.full((1, KPAD), -30.0, jnp.float32).at[0, :bins].set(
        params["dec"]["b"])
    # scalar passthrough gate, replicated across 128 lanes so the gate
    # logit is computed as an ordinary MXU matmul
    wg = jnp.tile(params["gate"]["w"], (1, 128))
    bg = jnp.tile(params["gate"]["b"].reshape(1, 1), (1, 128))
    return w1, w2, w3, wcep, benc, wdec, bdec, wg, bg


def _vmem_bytes(cfg, b_tile: int) -> int:
    """VMEM model (bytes, per tile): weights + bases, per-stream state,
    double-buffered stream blocks, and the dominant live temporaries."""
    h, L = cfg["hidden"], cfg["num_layers"]
    weights = (2 * L * h * 3 * h * 2                 # GRU bf16
               + (2 * (KPAD + KPAD_IM) + KPAD + KPAD_IM) * 512 * 2  # DFT bf16
               + (KPAD + 2 * NBPAD + 2 * h) * h * 2  # enc/dec bf16
               + KPAD * (NBPAD + CEP_LAGS_PAD) * 2)  # band + cep bases
    state = b_tile * (L * h * 4 + NBPAD * 4 + 256 * 2 + 256 * 4)
    streams = 2 * b_tile * T_BLOCK * 256 * (2 + 4)
    temps = b_tile * ((KPAD + KPAD_IM) * 4 * 3 + 3 * h * 4 * 2 + 512 * 6)
    return weights + state + streams + temps


def _pick_b_tile(b: int, cfg=None) -> int:
    """Largest batch tile that divides b and fits the VMEM budget."""
    for cand in (256, 128, 64, 32, 16, 8):
        if b % cand == 0 and (
                cfg is None or _vmem_bytes(cfg, cand) < 13 * 1024 * 1024):
            return cand
    return 0


def fused_sequence_supported(cfg, batch: int, t_len: int) -> bool:
    """Static shape/config gate for the fused engine kernel."""
    if cfg.get("kind", "mask_gru") != "mask_gru":
        return False
    if cfg.get("bins", NUM_BINS) != NUM_BINS or NUM_BINS > KPAD:
        return False
    if not cfg.get("snr_bands") or cfg["snr_bands"] > NBPAD:
        return False
    if not cfg.get("floor_feat"):
        return False
    if (cfg.get("cep_feats") or 0) > 8:
        return False
    if cfg.get("compute_dtype") != "bfloat16":
        return False
    if cfg["hidden"] % 128 != 0 or cfg["num_layers"] < 1:
        return False
    if t_len < T_BLOCK or t_len % T_BLOCK != 0:
        return False
    return _pick_b_tile(batch, cfg) > 0


@functools.partial(jax.jit, static_argnames=("cfg_key", "interpret", "b_tile"))
def _fused_call(params, carry, ola, floor, h, hops, cfg_key,
                interpret=False, b_tile=None):
    cfg = dict(cfg_key)
    bins, nb = cfg["bins"], cfg["snr_bands"]
    cep = cfg.get("cep_feats") or 0
    hidden, layers = cfg["hidden"], cfg["num_layers"]
    b, t_len, _ = hops.shape
    b_tile = b_tile or _pick_b_tile(b, cfg)

    consts = _np_constants(bins, nb, cep)
    w1, w2, w3, wcep, benc, wdec, bdec, wg, bg = _prep_weights(params, cfg)

    # NOTE (measured negative result): streaming the hops as f32 and
    # casting per-hop in-kernel was tried to skip this whole-chunk bf16
    # cast pass — it LOST 4% end-to-end (372k -> 358k audio-s/s at
    # B=512/T=376, 50-iter A/B): doubling the kernel's input DMA bytes
    # costs more than the one extra fused cast pass in XLA.
    operands = [
        hops.astype(jnp.bfloat16),
        jnp.asarray(consts["dft_fwd"][:FRAME_LENGTH], jnp.bfloat16),
        jnp.asarray(consts["dft_fwd"][FRAME_LENGTH:], jnp.bfloat16),
        jnp.asarray(consts["inv_re"], jnp.bfloat16),
        jnp.asarray(consts["inv_im"], jnp.bfloat16),
        jnp.asarray(consts["band"], jnp.bfloat16),
        jnp.asarray(consts["cepb"], jnp.bfloat16),
        jnp.asarray(consts["cmask"], jnp.float32),
        w1.astype(jnp.bfloat16), w2.astype(jnp.bfloat16),
        w3.astype(jnp.bfloat16), wcep.astype(jnp.float32),
        benc.astype(jnp.float32),
    ]

    def wspec(shape):
        return pl.BlockSpec(shape, lambda bb, tt: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    in_specs = [
        pl.BlockSpec((b_tile, T_BLOCK, 256), lambda bb, tt: (bb, tt, 0),
                     memory_space=pltpu.VMEM),
        wspec((FRAME_LENGTH, KPAD + KPAD_IM)),
        wspec((FRAME_LENGTH, KPAD + KPAD_IM)),
        wspec((KPAD, FFT_SIZE)),
        wspec((KPAD_IM, FFT_SIZE)), wspec((KPAD, NBPAD)),
        wspec((KPAD, CEP_LAGS_PAD)), wspec(consts["cmask"].shape),
        wspec((KPAD, hidden)), wspec((NBPAD, hidden)), wspec((NBPAD, hidden)),
        wspec(tuple(np.shape(wcep))), wspec((1, hidden)),
    ]
    for layer in params["gru"]:
        operands += [layer["wx"].astype(jnp.bfloat16),
                     layer["bx"].reshape(1, -1).astype(jnp.float32),
                     layer["wh"].astype(jnp.bfloat16),
                     layer["bh"].reshape(1, -1).astype(jnp.float32)]
        in_specs += [wspec((hidden, 3 * hidden)), wspec((1, 3 * hidden)),
                     wspec((hidden, 3 * hidden)), wspec((1, 3 * hidden))]
    operands += [wdec.astype(jnp.bfloat16), bdec.astype(jnp.float32),
                 wg.astype(jnp.bfloat16), bg.astype(jnp.float32)]
    in_specs += [wspec((hidden, KPAD)), wspec((1, KPAD)),
                 wspec((hidden, 128)), wspec((1, 128))]

    def sspec(*shape):
        return pl.BlockSpec((b_tile,) + shape,
                            lambda bb, tt: (bb,) + (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    h_spec = pl.BlockSpec((layers, b_tile, hidden),
                          lambda bb, tt: (0, bb, 0), memory_space=pltpu.VMEM)
    state_ops = [carry.astype(jnp.bfloat16), ola.astype(jnp.float32),
                 floor.astype(jnp.float32), h.astype(jnp.float32)]
    state_specs = [sspec(256), sspec(256), sspec(NBPAD), h_spec]
    n_in = len(operands)
    operands += state_ops
    in_specs += state_specs

    out_specs = [
        pl.BlockSpec((b_tile, T_BLOCK, 256), lambda bb, tt: (bb, tt, 0),
                     memory_space=pltpu.VMEM),
    ] + state_specs
    out_shape = [
        jax.ShapeDtypeStruct((b, t_len, 256), jnp.float32),
        jax.ShapeDtypeStruct((b, 256), jnp.bfloat16),
        jax.ShapeDtypeStruct((b, 256), jnp.float32),
        jax.ShapeDtypeStruct((b, NBPAD), jnp.float32),
        jax.ShapeDtypeStruct((layers, b, hidden), jnp.float32),
    ]

    outs = pl.pallas_call(
        functools.partial(_kernel, layers=layers, cep=cep, cfg=cfg),
        grid=(b // b_tile, t_len // T_BLOCK),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        input_output_aliases={n_in: 1, n_in + 1: 2, n_in + 2: 3, n_in + 3: 4},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
    )(*operands)
    out, _, ola_f, floor_f, h_f = outs
    return out, ola_f, floor_f, h_f


def fused_sequence(params, state, hops, cfg, *, interpret=False, b_tile=None):
    """Fused-engine sequence step: (params, engine-state, hops [B,T,256] f32)
    -> (new_state, out [B,T,256] f32). Same engine-state pytree contract as
    engine.core's ``sequence``; numerics are the fused path's own (bf16
    spectral rounding, see module docstring) but chunking is exact: calling
    this over [0:T1] then [T1:T] equals one [0:T] call bit-for-bit."""
    nb = cfg["snr_bands"]
    floor = state["model"]["floor"]
    floor_pad = jnp.full((floor.shape[0], NBPAD), 30.0,
                         jnp.float32).at[:, :nb].set(floor)
    h = jnp.moveaxis(state["model"]["h"], -2, 0)           # [L, B, H]
    cfg_key = tuple(sorted((k, v) for k, v in cfg.items()
                           if isinstance(v, (int, float, str, bool))))
    out, ola_f, floor_f, h_f = _fused_call(
        params, state["input_carry"], state["ola"], floor_pad, h, hops,
        cfg_key, interpret=interpret, b_tile=b_tile)
    new_state = {
        "input_carry": hops[..., -1, :],
        "ola": ola_f,
        "model": {"h": jnp.moveaxis(h_f, 0, -2), "floor": floor_f[:, :nb]},
    }
    return new_state, out


def fused_sequence_ref(params, state, hops, cfg):
    """Pure-jnp mirror of the kernel's exact op order/dtypes (tests)."""
    nb = cfg["snr_bands"]
    cep = cfg.get("cep_feats") or 0
    consts = _np_constants(cfg["bins"], nb, cep)
    w1, w2, w3, wcep, benc, wdec, bdec, wg, bg = _prep_weights(params, cfg)
    w1, w2, w3 = (w.astype(jnp.bfloat16) for w in (w1, w2, w3))
    wdec = wdec.astype(jnp.bfloat16)
    wg = wg.astype(jnp.bfloat16)
    dftt = jnp.asarray(consts["dft_fwd"][:FRAME_LENGTH], jnp.bfloat16)
    dftb = jnp.asarray(consts["dft_fwd"][FRAME_LENGTH:], jnp.bfloat16)
    invr = jnp.asarray(consts["inv_re"], jnp.bfloat16)
    invi = jnp.asarray(consts["inv_im"], jnp.bfloat16)
    band = jnp.asarray(consts["band"], jnp.bfloat16)
    cepb = jnp.asarray(consts["cepb"], jnp.bfloat16)
    cmask = jnp.asarray(consts["cmask"], jnp.float32)
    eps2 = np.float32(cfg["feat_eps"]) ** 2
    hidden, layers = cfg["hidden"], cfg["num_layers"]

    carry = state["input_carry"].astype(jnp.bfloat16)
    ola = state["ola"].astype(jnp.float32)
    floor = jnp.full((hops.shape[0], NBPAD), 30.0,
                     jnp.float32).at[:, :nb].set(state["model"]["floor"])
    h = jnp.moveaxis(state["model"]["h"], -2, 0).astype(jnp.float32)
    hops_bf = hops.astype(jnp.bfloat16)

    outs = []
    for t in range(hops.shape[1]):
        hop = hops_bf[:, t, :]
        spec = (jnp.dot(carry, dftt, preferred_element_type=jnp.float32)
                + jnp.dot(hop, dftb, preferred_element_type=jnp.float32))
        re, im = spec[:, :KPAD], spec[:, KPAD:]
        im2 = im * im
        mag2 = re * re + jnp.concatenate(
            [im2, jnp.zeros_like(im2[:, :KPAD - KPAD_IM])], axis=-1)
        logmag = 0.5 * jnp.log(mag2 + eps2)
        feat = (logmag + cfg["feat_shift"]) * cfg["feat_scale"]
        lb = jnp.log(jnp.dot(mag2.astype(jnp.bfloat16), band,
                             preferred_element_type=jnp.float32) + eps2)
        floor = jnp.minimum(floor + np.float32(cfg["floor_rise"]), lb)
        snr = jnp.clip((lb - floor) * cfg["snr_scale"], 0.0, cfg["snr_clip"])
        lvl = (floor + 9.0) * 0.15
        enc = (jnp.dot(feat.astype(jnp.bfloat16), w1,
                       preferred_element_type=jnp.float32)
               + jnp.dot(snr.astype(jnp.bfloat16), w2,
                         preferred_element_type=jnp.float32)
               + jnp.dot(lvl.astype(jnp.bfloat16), w3,
                         preferred_element_type=jnp.float32)
               + benc[0])
        if cep:
            c = jnp.dot(logmag.astype(jnp.bfloat16), cepb,
                        preferred_element_type=jnp.float32)
            for g in range(cep):
                mg = jnp.max(jnp.where(cmask[g][None, :] > 0, c, -1e30),
                             axis=1, keepdims=True)
                cg = jnp.clip(mg * cfg["cep_scale"], -1.0, 4.0)
                enc = enc + cg * wcep[g][None, :]
        x_f = jax.nn.gelu(enc)
        x_bf = x_f.astype(jnp.bfloat16)
        new_h = []
        for l, layer in enumerate(params["gru"]):
            hp = jnp.dot(h[l].astype(jnp.bfloat16),
                         layer["wh"].astype(jnp.bfloat16),
                         preferred_element_type=jnp.float32) + layer["bh"]
            xp = jnp.dot(x_bf, layer["wx"].astype(jnp.bfloat16),
                         preferred_element_type=jnp.float32) + layer["bx"]
            h_new = _gru_gates(h[l], hp, xp, hidden)
            new_h.append(h_new)
            x_f = x_f + h_new
            x_bf = x_f.astype(jnp.bfloat16)
        h = jnp.stack(new_h)
        mask = jax.nn.sigmoid(jnp.dot(x_bf, wdec,
                                      preferred_element_type=jnp.float32)
                              + bdec[0])
        g128 = jax.nn.sigmoid(jnp.dot(x_bf, wg,
                                      preferred_element_type=jnp.float32)
                              + bg[0])
        gate = jnp.concatenate([g128] * (KPAD // 128), axis=-1)
        mask = mask + gate * (1.0 - mask)
        mre = (re * mask).astype(jnp.bfloat16)
        mim = (im * mask[:, :KPAD_IM]).astype(jnp.bfloat16)
        synth = (jnp.dot(mre, invr, preferred_element_type=jnp.float32)
                 + jnp.dot(mim, invi, preferred_element_type=jnp.float32))
        outs.append(synth[:, :FRAME_LENGTH] + ola)
        ola = synth[:, FRAME_LENGTH:]
        carry = hop
    new_state = {
        "input_carry": hops[..., -1, :],
        "ola": ola,
        "model": {"h": jnp.moveaxis(h, 0, -2),
                  "floor": floor[:, :nb]},
    }
    return new_state, jnp.stack(outs, axis=1)


__all__ = ["fused_sequence", "fused_sequence_ref", "fused_sequence_supported"]
