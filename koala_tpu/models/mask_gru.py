"""KoalaNet: frame-wise GRU spectral-mask estimator (the flagship model).

Architecture (ours; the reference model is an opaque ~2M-param blob inside
lib/common/koala_params.pv — SURVEY.md §2 #2 — so this is a from-scratch
design sized to the same parameter budget):

    log-magnitude features [*, 257]
      -> Dense(257 -> H) + gelu          (encoder)
      -> N x GRU(H) with residual adds   (recurrent core)
      -> Dense(H -> 257) + sigmoid       (decoder -> magnitude mask in [0,1])
      -> passthrough gate: g = sigmoid(Dense(H -> 1)); mask += g * (1-mask)

The gate head is the learned analog of a noise-floor tracker: a per-frame
scalar, driven by the GRU's temporal context, that blends the whole mask
toward unity when the stream looks clean. Rationale: the acceptance
harness (reference binding/python/test_koala.py:75,106-114) demands
per-frame RMS passthrough of PURE speech within 0.02 — and the hard
frames there are quiet broadband fricatives that are locally
indistinguishable from noise; only stream-level context ("this stream has
been clean speech for seconds") disambiguates them. A scalar gate gives
the model a direct, easily-learned knob for exactly that decision.

TPU-first layout decisions:
- H = 384 (3 x 128 MXU lanes); all hot matmuls are [*,H]@[H,3H] or
  [*,257]@[257,H] — MXU-shaped, bfloat16-friendly.
- The GRU input projection (x @ W_x) has no time dependence, so sequence
  mode hoists it out of the scan into ONE [B*T, H] @ [H, 3H] matmul per
  layer; the lax.scan carries only the [B, H] hidden state and does the
  [B,H]@[H,3H] recurrent matmul per step. This is the difference between a
  bandwidth-bound scan of tiny ops and an MXU-bound pipeline.
- Streaming invariant: state is O(1) per stream ([L, B, H] hiddens), reset
  = exact zeroing, matching the reference's bit-determinism contract
  (reference test: binding/python/test_koala.py:116-129).

Gate math (z = update, r = reset, n = candidate; separate hidden-side bias
so the reset gate modulates the full hidden contribution):
    z = sigmoid(xz + h @ Whz + bhz)
    r = sigmoid(xr + h @ Whr + bhr)
    n = tanh(xn + r * (h @ Whn + bhn))
    h' = (1 - z) * n + z * h
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import NUM_BINS

DEFAULT_CONFIG = {
    "kind": "mask_gru",
    "hidden": 384,
    "num_layers": 2,
    "bins": NUM_BINS,
    "feat_eps": 1e-4,
    "feat_scale": 0.25,   # affine on log-magnitude, roughly unit-variance
    "feat_shift": 1.5,
    # Noise-floor tracker (minimum statistics): per-stream banded log-energy
    # floor that drops instantly to new minima and creeps up ``floor_rise``
    # ln-units per 16 ms frame (~6.4 dB/s). The model input gains
    # ``snr_bands`` posterior-SNR features clip((log E_band - floor) *
    # snr_scale, 0, snr_clip). Rationale: the acceptance harness's hardest
    # real-speech frames are quiet broadband fricatives that are locally
    # noise-like; what disambiguates them is that the STREAM's noise floor
    # is far below them (clean recording). Posterior SNR is self-normalizing
    # (level/channel-invariant), so it transfers from synthetic training
    # speech to real recordings where absolute spectral templates do not.
    # snr_bands=0 disables the tracker. The tracker is OPT-IN: defaults
    # stay at the legacy-off values so model files saved before these keys
    # existed keep loading unchanged when call sites merge DEFAULT_CONFIG
    # over a saved config (the reference's versioned koala_params.pv never
    # breaks on engine upgrade — SURVEY §2 #2; round-3 regression).
    # Training enables it via TRAIN_CONFIG below.
    "snr_bands": 0,
    "floor_rise": 0.012,
    "snr_scale": 0.2,
    "snr_clip": 4.0,
    # Feed the tracked floor LEVEL itself (banded, absolute) alongside the
    # relative posterior SNR: at-floor content looks identical in SNR
    # terms whether the stream floor is -45 dB mic hiss (pass it) or
    # -29 dB noise filling speech gaps (suppress it) — the absolute floor
    # level is what disambiguates. Off by default (legacy model files).
    "floor_feat": False,
    # Cepstral-peak (harmonicity) features: ``cep_feats`` group-maxima of
    # the real cepstrum over the pitch-lag range 40..200 samples (F0
    # 80..400 Hz at 16 kHz). Rationale: the hardest residual battery gap is
    # BABBLE — overlapping talkers are locally speech-like in every
    # log-magnitude/SNR feature the model gets, but a single voice has ONE
    # coherent harmonic comb (strong cepstral peak at its pitch lag) while
    # summed talkers cancel each other's combs; clicks/impulses are
    # spectrally flat (no peak at all). The cepstrum is linear in the log
    # spectrum, so these are one fixed matmul + a grouped max — frame-local
    # (hoists out of the scan), and mean-free in log-magnitude => gain-
    # invariant by construction. 0 disables (legacy model files).
    "cep_feats": 0,
    "cep_scale": 2.0,
    # MXU compute dtype for the model matmuls (accumulation stays f32 via
    # preferred_element_type). bfloat16 runs the MXU at full rate; the mask
    # head stays well inside the harness tolerance. Gate math and state
    # remain f32.
    "compute_dtype": "bfloat16",
    # Fused Pallas recurrence for sequence mode: "auto" enables it on TPU
    # backends when shapes qualify (ops/pallas/gru.py); False forces the
    # XLA lax.scan path (used for training, whose backward runs through
    # the scan implementation, and for CPU tests).
    "use_pallas": "auto",
}

# The config new models are trained with: posterior-SNR + absolute-floor
# tracker features + cepstral harmonicity features enabled. save_params
# persists the FULL resolved config, so a file trained with this config
# carries its feature switches explicitly and never depends on future
# DEFAULT_CONFIG values.
TRAIN_CONFIG = dict(DEFAULT_CONFIG, snr_bands=32, floor_feat=True,
                    cep_feats=8)


def expected_enc_in(cfg: Dict[str, Any]) -> int:
    """Encoder fan-in implied by a config's feature switches."""
    nb = cfg.get("snr_bands") or 0
    return (cfg["bins"] + nb * (2 if cfg.get("floor_feat") else 1)
            + (cfg.get("cep_feats") or 0))


def normalize_config(config: Dict[str, Any], params=None) -> Dict[str, Any]:
    """Resolve a (possibly legacy, partial) saved config against defaults,
    and — when ``params`` is given — verify the feature switches against
    the actual encoder weight shape, inferring them from the weights if the
    saved config predates a switch. This is the model-file compatibility
    layer: a .pv written by ANY prior version must load and run
    (reference bar: versioned lib/common/koala_params.pv, SURVEY §2 #2)."""
    cfg = dict(DEFAULT_CONFIG, **(config or {}))
    if params is None:
        return cfg
    enc_in = int(np.shape(params["enc"]["w"])[0])
    if enc_in == expected_enc_in(cfg):
        return cfg
    bins = cfg["bins"]
    for snr_bands, floor_feat, cep in ((0, False, 0), (32, False, 0),
                                       (32, True, 0), (32, True, 8)):
        trial = dict(cfg, snr_bands=snr_bands, floor_feat=floor_feat,
                     cep_feats=cep)
        if enc_in == expected_enc_in(trial):
            return trial
    raise ValueError(
        "model file encoder fan-in %d matches no known feature layout "
        "(bins=%d, config %r)" % (enc_in, bins, config))


def _warn_fallback(reason: str, cfg) -> bool:
    """Loud (once per reason+config) scan fallback on accelerator backends,
    so a silently-degraded hot path is visible (VERDICT round-1 weak #2)."""
    import jax as _jax

    if _jax.default_backend() != "cpu" and cfg.get("use_pallas") in ("auto", True):
        key = (reason, cfg.get("num_layers"), cfg.get("hidden"))
        if key not in _FALLBACK_WARNED:
            _FALLBACK_WARNED.add(key)
            from ..profiling import logger
            logger.warning(
                "mask_gru: fused Pallas recurrence DISABLED (%s; layers=%s "
                "hidden=%s) — sequence mode falls back to the lax.scan path",
                reason, cfg.get("num_layers"), cfg.get("hidden"))
    return False


def _pallas_backend_ok(cfg) -> bool:
    """Backend-level gate shared by the fused kernels (GRU + floor scan):
    Pallas engages on accelerator backends unless the config disables it."""
    if cfg.get("use_pallas") in (False, None):
        return False
    import jax as _jax

    return _jax.default_backend() not in ("cpu",)


def _pallas_enabled(cfg, x) -> bool:
    if cfg.get("use_pallas") in (False, None):
        return False
    if cfg.get("compute_dtype") != "bfloat16":
        return _warn_fallback("compute_dtype != bfloat16", cfg)
    if x.ndim != 3:          # need [B, T, H]
        return False
    from ..ops.pallas.gru import gru_stack_supported

    # NOTE: under a sharded jit this shape must be the per-device LOCAL
    # block — callers shard via jax.shard_map (parallel/runner.py), never
    # plain GSPMD-partitioned jit around pallas_call.
    b = x.shape[0]
    if not gru_stack_supported(cfg["num_layers"], b, cfg["hidden"]):
        return _warn_fallback("unsupported shape B=%d" % b, cfg)
    if cfg.get("use_pallas") == "auto":
        import jax as _jax
        return _jax.default_backend() not in ("cpu",)
    return True


def _mm(x, w, cfg):
    """Model matmul in the configured compute dtype, f32 accumulate."""
    dt = jnp.bfloat16 if cfg.get("compute_dtype") == "bfloat16" else jnp.float32
    return jnp.matmul(x.astype(dt), w.astype(dt),
                      preferred_element_type=jnp.float32)


def num_params(params) -> int:
    return sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params))


def init_params(key, config: Dict[str, Any] = None) -> Dict[str, Any]:
    cfg = dict(DEFAULT_CONFIG, **(config or {}))
    h, layers, bins = cfg["hidden"], cfg["num_layers"], cfg["bins"]
    keys = jax.random.split(key, 2 + 2 * layers)

    def dense(k, fan_in, fan_out):
        scale = 1.0 / np.sqrt(fan_in)
        return {
            "w": jax.random.uniform(k, (fan_in, fan_out), jnp.float32, -scale, scale),
            "b": jnp.zeros((fan_out,), jnp.float32),
        }

    def gru(kx, kh, dim):
        scale = 1.0 / np.sqrt(dim)
        return {
            "wx": jax.random.uniform(kx, (dim, 3 * dim), jnp.float32, -scale, scale),
            "wh": jax.random.uniform(kh, (dim, 3 * dim), jnp.float32, -scale, scale),
            "bx": jnp.zeros((3 * dim,), jnp.float32),
            "bh": jnp.zeros((3 * dim,), jnp.float32),
        }

    enc_in = expected_enc_in(cfg)
    params = {
        "enc": dense(keys[0], enc_in, h),
        "gru": [gru(keys[2 + 2 * i], keys[3 + 2 * i], h) for i in range(layers)],
        "dec": dense(keys[1], h, bins),
        # Passthrough gate head: zero weights + bias -2 => g ~= 0.12 at
        # init, so a freshly-added gate barely perturbs a warm-started
        # model; training opens it where stream context warrants.
        "gate": {"w": jnp.zeros((h, 1), jnp.float32),
                 "b": jnp.full((1,), -2.0, jnp.float32)},
    }
    # Bias the decoder toward mask ~= 1 at init so an untrained model is a
    # near-passthrough (keeps the delay/determinism tests meaningful before
    # training, and is a good optimization starting point).
    params["dec"]["b"] = params["dec"]["b"] + 3.0
    return params


def features(re: jnp.ndarray, im: jnp.ndarray, cfg: Dict[str, Any]) -> jnp.ndarray:
    """Spectrum -> model input features: scaled log-magnitude."""
    mag = jnp.sqrt(re * re + im * im + cfg["feat_eps"] ** 2)
    return (jnp.log(mag) + cfg["feat_shift"]) * cfg["feat_scale"]


@functools.lru_cache(maxsize=8)
def _band_matrix_np(bins: int, nb: int):
    """[bins, nb] mel-spaced contiguous averaging pools (fixed, not learned)."""
    def hz_to_mel(f):
        return 2595.0 * np.log10(1.0 + f / 700.0)

    hz = 700.0 * (10.0 ** (np.linspace(0.0, hz_to_mel(8000.0), nb + 1)
                           / 2595.0) - 1.0)
    edges = np.round(hz / 8000.0 * (bins - 1)).astype(np.int64)
    edges = np.maximum(edges, np.arange(nb + 1))      # ensure distinct groups
    edges[-1] = bins
    m = np.zeros((bins, nb), np.float32)
    for j in range(nb):
        lo, hi = int(edges[j]), int(edges[j + 1])
        m[lo:hi, j] = 1.0 / max(hi - lo, 1)
    return m


@functools.lru_cache(maxsize=8)
def _cep_matrix_np(bins: int, nb: int):
    """([bins, n_lags] IDFT-of-log-spectrum basis, [n_lags, nb] group-max
    assignment edges) for pitch lags 40..200 samples (F0 80..400 Hz).

    The analysis frame is 512 samples, so the real cepstrum at lag q is
    c[q] = (1/512) sum_j L_j cos(2*pi*j*q/512) over the symmetric log
    spectrum L — expressed over the one-sided bins k=0..256 with weight 2
    for interior bins. Rows are mean-free in L for q>0, so the features
    are invariant to broadband gain."""
    lags = np.arange(40, 201)
    k = np.arange(bins)[:, None].astype(np.float64)
    w = np.full((bins, 1), 2.0 / 512.0)
    w[0] = w[-1] = 1.0 / 512.0
    basis = (w * np.cos(2.0 * np.pi * k * lags[None, :] / 512.0)).astype(np.float32)
    edges = np.round(40.0 * (200.0 / 40.0) ** (np.arange(nb + 1) / nb)
                     ).astype(np.int64)
    bounds = tuple((int(edges[g] - 40), int(edges[g + 1] - 40 + 1))
                   for g in range(nb))      # contiguous lag-index slices
    return basis, bounds


def cep_features(re: jnp.ndarray, im: jnp.ndarray, cfg: Dict[str, Any]) -> jnp.ndarray:
    """Spectrum [*, K] -> cepstral-peak harmonicity features [*, cep_feats]:
    max of the real cepstrum within each of ``cep_feats`` log-spaced pitch
    lag groups (see DEFAULT_CONFIG['cep_feats'] rationale)."""
    nb = cfg["cep_feats"]
    basis, bounds = _cep_matrix_np(cfg["bins"], nb)
    logmag = 0.5 * jnp.log(re * re + im * im + cfg["feat_eps"] ** 2)
    c = jnp.matmul(logmag, jnp.asarray(basis))            # [*, n_lags]
    gmax = jnp.stack([jnp.max(c[..., lo:hi], axis=-1) for lo, hi in bounds],
                     axis=-1)                             # [*, nb]
    return jnp.clip(gmax * cfg["cep_scale"], -1.0, 4.0)


def band_log_energy(re: jnp.ndarray, im: jnp.ndarray, cfg: Dict[str, Any]) -> jnp.ndarray:
    """Spectrum [*, K] -> banded log-energy [*, nb] (floor-tracker domain)."""
    m = jnp.asarray(_band_matrix_np(cfg["bins"], cfg["snr_bands"]))
    e = jnp.matmul(re * re + im * im, m)
    return jnp.log(e + cfg["feat_eps"] ** 2)


def _floor_update(floor, lb, cfg):
    """One frame of minimum-statistics tracking: drop to new minima, creep
    up floor_rise per frame otherwise. floor/lb [*, nb] log-energy."""
    return jnp.minimum(floor + cfg["floor_rise"], lb)


def _snr_features(lb, floor, cfg):
    snr = jnp.clip((lb - floor) * cfg["snr_scale"], 0.0, cfg["snr_clip"])
    if not cfg.get("floor_feat"):
        return snr
    lvl = (floor + 9.0) * 0.15        # banded absolute floor level
    return jnp.concatenate([snr, lvl], axis=-1)


def _mask_head(params, x, cfg):
    """Decoder mask + scalar passthrough gate (see module docstring).
    ``gate`` is optional in the pytree so pre-gate model files keep
    loading/running unchanged."""
    mask = jax.nn.sigmoid(_mm(x, params["dec"]["w"], cfg) + params["dec"]["b"])
    if "gate" in params:
        g = jax.nn.sigmoid(_mm(x, params["gate"]["w"], cfg)
                           + params["gate"]["b"])
        mask = mask + g * (1.0 - mask)
    return mask


def _gru_recurrent(layer, h, xproj, cfg):
    """One GRU step given precomputed input projection xproj = x@wx + bx."""
    hproj = _mm(h, layer["wh"], cfg) + layer["bh"]
    xz, xr, xn = jnp.split(xproj, 3, axis=-1)
    hz, hr, hn = jnp.split(hproj, 3, axis=-1)
    z = jax.nn.sigmoid(xz + hz)
    r = jax.nn.sigmoid(xr + hr)
    n = jnp.tanh(xn + r * hn)
    return (1.0 - z) * n + z * h


def init_state(batch_shape: Tuple[int, ...], config: Dict[str, Any] = None,
               dtype=jnp.float32):
    # Batch dims LEAD (engine contract: every state leaf is [*batch, ...] so
    # per-stream masked reset can broadcast a [*batch] mask over any leaf).
    cfg = dict(DEFAULT_CONFIG, **(config or {}))
    h = jnp.zeros(tuple(batch_shape) + (cfg["num_layers"], cfg["hidden"]), dtype)
    nb = cfg.get("snr_bands") or 0
    if not nb:
        return h          # legacy (pre-tracker) state layout
    # floor init = +30 log-energy (far above any real signal) so the first
    # frame's minimum claims it immediately — a fresh stream has no history.
    return {"h": h,
            "floor": jnp.full(tuple(batch_shape) + (nb,), 30.0, dtype)}


def _feat_dtype(cfg):
    """Dtype the feature groups are emitted in. The encoder matmul casts
    its input to the compute dtype anyway (_mm), so casting each group
    BEFORE the concat is bitwise identical at the matmul — and halves the
    HBM traffic of the concatenated [*, T, enc_in] feature tensor."""
    return (jnp.bfloat16 if cfg.get("compute_dtype") == "bfloat16"
            else jnp.float32)


def step(params, state, re, im, config: Dict[str, Any] = None):
    """Single-frame step: (state pytree, [*,K] spectrum) -> (state', mask [*,K])."""
    cfg = dict(DEFAULT_CONFIG, **(config or {}))
    nb = cfg.get("snr_bands") or 0
    dt = _feat_dtype(cfg)
    x = features(re, im, cfg).astype(dt)
    if nb:
        lb = band_log_energy(re, im, cfg)
        floor = _floor_update(state["floor"], lb, cfg)
        x = jnp.concatenate([x, _snr_features(lb, floor, cfg).astype(dt)],
                            axis=-1)
        hstate = state["h"]
    else:
        hstate = state
    if cfg.get("cep_feats"):
        x = jnp.concatenate([x, cep_features(re, im, cfg).astype(dt)], axis=-1)
    x = jax.nn.gelu(_mm(x, params["enc"]["w"], cfg) + params["enc"]["b"])
    new_states = []
    for i, layer in enumerate(params["gru"]):
        xproj = _mm(x, layer["wx"], cfg) + layer["bx"]
        h = _gru_recurrent(layer, hstate[..., i, :], xproj, cfg)
        new_states.append(h)
        x = x + h  # residual
    mask = _mask_head(params, x, cfg)
    h_new = jnp.stack(new_states, axis=-2)
    return ({"h": h_new, "floor": floor} if nb else h_new), mask


def apply_sequence(params, state, re, im, config: Dict[str, Any] = None):
    """Sequence mode: spectra [*, T, K] -> (final_state, masks [*, T, K]).

    Hoists all time-independent matmuls (features/encoder/input projections/
    decoder) out of the scan; the scan carries only [L, *, H] hidden state.
    """
    cfg = dict(DEFAULT_CONFIG, **(config or {}))
    nb = cfg.get("snr_bands") or 0
    dt = _feat_dtype(cfg)
    x = features(re, im, cfg).astype(dt)                        # [*, T, K]
    if nb:
        # Floor tracking is a cheap elementwise recurrence over [*, nb] but
        # strictly sequential over T. On TPU it runs as ONE fused Pallas
        # kernel (ops/pallas/floor.py — same op order, bit-identical to the
        # step path and exactly chunkable, differentiable via custom_vjp);
        # elsewhere as a lax.scan. All heavy matmuls stay hoisted out.
        lb = band_log_energy(re, im, cfg)                       # [*, T, nb]
        t_ax = lb.ndim - 2
        lb_t = jnp.moveaxis(lb, t_ax, 0)                        # [T, *, nb]

        if _pallas_backend_ok(cfg) and lb_t.ndim == 3 and lb_t.shape[1] >= 8:
            from ..ops.pallas.floor import floor_scan_trainable

            floor_final, floors = floor_scan_trainable(
                state["floor"], lb_t, float(cfg["floor_rise"]))
        else:
            def floor_scan(fl, lb_step):
                fl2 = _floor_update(fl, lb_step, cfg)
                return fl2, fl2

            floor_final, floors = jax.lax.scan(
                floor_scan, state["floor"], lb_t)
        snr = _snr_features(lb_t, floors, cfg).astype(dt)
        x = jnp.concatenate([x, jnp.moveaxis(snr, 0, t_ax)], axis=-1)
        state = state["h"]
    if cfg.get("cep_feats"):
        # Frame-local, so it stays hoisted out of the scan like the rest of
        # the feature/encoder pipeline.
        x = jnp.concatenate([x, cep_features(re, im, cfg).astype(dt)], axis=-1)
    x = jax.nn.gelu(_mm(x, params["enc"]["w"], cfg) + params["enc"]["b"])  # [*, T, H]

    if _pallas_enabled(cfg, x):
        # gru_stack_trainable = the fused kernel forward with a custom_vjp
        # (analytic reverse scan over kernel-streamed hidden residuals), so
        # this path is differentiable and training uses the fused forward.
        # (Streaming the kernel in the model's native [B, T, H] layout was
        # tried and is structurally impossible: a [B, 1, H] block violates
        # the Mosaic constraint that the last two block dims be 8/128-
        # divisible or full-size — so the layout transposes stay.)
        from ..ops.pallas.gru import gru_stack_trainable

        y, h_final = gru_stack_trainable(
            jnp.moveaxis(state, 1, 0),                          # [L, B, H]
            jnp.moveaxis(x, 1, 0),                              # [T, B, H]
            params["gru"])
        x = jnp.moveaxis(y, 0, 1)                               # [B, T, H]
        state = jnp.moveaxis(h_final, 0, 1)                     # [B, L, H]
        if nb:
            state = {"h": state, "floor": floor_final}
        return state, _mask_head(params, x, cfg)

    t_axis = x.ndim - 2
    for i, layer in enumerate(params["gru"]):
        xproj = _mm(x, layer["wx"], cfg) + layer["bx"]          # [*, T, 3H]
        xproj_t = jnp.moveaxis(xproj, t_axis, 0)                # [T, *, 3H]

        def scan_fn(h, xp, _layer=layer):
            h_new = _gru_recurrent(_layer, h, xp, cfg)
            return h_new, h_new

        h_final, hs = jax.lax.scan(scan_fn, state[..., i, :], xproj_t)  # hs: [T, *, H]
        state = state.at[..., i, :].set(h_final)
        x = x + jnp.moveaxis(hs, 0, t_axis)
    if nb:
        state = {"h": state, "floor": floor_final}
    return state, _mask_head(params, x, cfg)


__all__ = [
    "DEFAULT_CONFIG",
    "TRAIN_CONFIG",
    "normalize_config",
    "expected_enc_in",
    "init_params",
    "init_state",
    "step",
    "apply_sequence",
    "features",
    "num_params",
]
