"""Engine throughput sweep + component split + MXU roofline (one TPU chip).

Answers VERDICT r2 weak #8: where does the chunk time go, how far is the
fused recurrence from the MXU bound, and which (batch, chunk_frames)
maximizes audio-s/s/chip. Writes resources/reports/engine_roofline.json.

Run on the real chip (no other TPU process!):
    python scripts/bench_sweep.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# TPU v5e (lite) peak numbers for the roofline. bf16 MXU peak is 197
# TFLOP/s per chip (the public v5e spec); the r4 report divided this by 2
# (a misremembered "bf16 double-rate" halving), which produced the
# impossible mxu_fraction=1.22 (VERDICT r4 weak #3 / #4).
PEAK_BF16_FLOPS = 197e12         # dense bf16 MXU peak
PEAK_HBM_BPS = 819e9             # ~819 GB/s


def timed(fn, sync, iters=20):
    fn()          # warm/compile
    sync()
    t0 = time.perf_counter()
    for _ in range(iters):
        fn()
    sync()
    return (time.perf_counter() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp

    from koala_tpu.constants import FRAME_LENGTH, SAMPLE_RATE
    from koala_tpu.engine.core import make_engine
    from koala_tpu.models import mask_gru, params_io
    from koala_tpu.ops.pallas.gru import flatten_layer_params, gru_stack_pallas

    model_path = os.path.join(REPO, "models", "koala_params_tpu.pv")
    if os.path.exists(model_path):
        params, config = params_io.load_params(model_path)
    else:
        params, config = (mask_gru.init_params(jax.random.PRNGKey(0),
                                            mask_gru.TRAIN_CONFIG),
                          dict(mask_gru.TRAIN_CONFIG))
    engine = make_engine(config.get("kind", "mask_gru"), config)
    dev = jax.devices()[0]
    params = jax.device_put(params, dev)
    report = {"device": str(dev)}

    # block_until_ready is unreliable over the dev tunnel; sync via scalar.
    @jax.jit
    def checksum(x):
        return jnp.sum(x[..., -1])

    # -- 1. component split at the bench shape ----------------------------
    B, T = 512, 376
    H = config.get("hidden", 384)
    L = config.get("num_layers", 2)
    key = jax.random.PRNGKey(0)
    hops = 0.1 * jax.random.normal(key, (B, T, FRAME_LENGTH), jnp.float32)
    hops = jax.device_put(hops, dev)
    state0 = jax.device_put(engine.init_state((B,)), dev)

    holder = {"state": state0}

    def run_full():
        holder["state"], out = engine.sequence_jit(params, holder["state"], hops)
        holder["out"] = out

    def sync():
        float(checksum(holder.get("out", hops)))

    t_full = timed(run_full, sync)
    report["xla_sequence_ms"] = round(t_full * 1e3, 3)

    # fully-fused engine kernel (ops/pallas/engine_fused.py) — the bench
    # headline path (engine.sequence_fast_jit), plus a batch-tile sweep.
    holder_f = {"state": jax.device_put(engine.init_state((B,)), dev)}

    def run_fused():
        holder_f["state"], out = engine.sequence_fast_jit(
            params, holder_f["state"], hops)
        holder["out"] = out

    t_fused = timed(run_fused, sync)
    report["full_sequence_ms"] = round(t_fused * 1e3, 3)
    from koala_tpu.ops.pallas.engine_fused import (fused_sequence,
                                                   _pick_b_tile)
    report["fused_b_tile"] = _pick_b_tile(B, config)
    tiles = {}
    for bt in (64, 128, 256):
        if B % bt:
            continue
        st = jax.device_put(engine.init_state((B,)), dev)
        full_state = {"input_carry": st["input_carry"], "ola": st["ola"],
                      "model": st["model"]}
        try:
            fcall = jax.jit(lambda p2, s2, h2, bt=bt: fused_sequence(
                p2, s2, h2, config, b_tile=bt))
            hold_t = {"state": full_state}

            def run_tile(fcall=fcall, hold_t=hold_t):
                hold_t["state"], out = fcall(params, hold_t["state"], hops)
                holder["out"] = out

            tiles["b_tile_%d_ms" % bt] = round(timed(run_tile, sync) * 1e3, 3)
        except Exception as e:                          # VMEM overflow etc.
            tiles["b_tile_%d_ms" % bt] = "failed: %s" % str(e)[:80]
        print("tile", bt, tiles["b_tile_%d_ms" % bt], flush=True)
    report["fused_tile_sweep"] = tiles

    # kernel alone (same shapes the sequence path feeds it)
    x = 0.1 * jax.random.normal(key, (T, B, H), jnp.float32)
    h0 = jnp.zeros((L, B, H), jnp.float32)
    x, h0 = jax.device_put((x, h0), dev)
    flat = flatten_layer_params(params["gru"])

    def run_kernel():
        y, hf = gru_stack_pallas(h0, x, *flat)
        holder["out"] = y

    t_kernel = timed(run_kernel, sync)
    report["kernel_ms"] = round(t_kernel * 1e3, 3)
    report["non_kernel_ms"] = round((t_full - t_kernel) * 1e3, 3)

    # roofline for the recurrence
    flops_per_step = 2 * L * 2 * B * H * 3 * H      # xproj+hproj per layer
    mxu_bound_s = T * flops_per_step / PEAK_BF16_FLOPS
    hbm_bytes = T * (2 * B * H * 2)                 # x in + y out, bf16
    hbm_bound_s = hbm_bytes / PEAK_HBM_BPS
    report["kernel_roofline"] = {
        "mxu_bound_ms": round(mxu_bound_s * 1e3, 3),
        "hbm_bound_ms": round(hbm_bound_s * 1e3, 3),
        "mxu_fraction": round(mxu_bound_s / t_kernel, 3),
        "note": ("mxu_fraction = fraction of MXU peak the kernel achieves; "
                 "the binding resource is whichever bound is larger."),
    }

    # -- 1b. non-kernel component split (VERDICT r4 #3: 65% of engine time
    # was outside the fused kernel; find out what it is). Each variant times
    # the full sequence path with one component ablated/isolated.
    import jax as _jax

    comp = {}

    # (a) floor-tracker scan cost: same model with snr_bands=0 (drops the
    # sequential lax.scan over T AND the tracker features).
    if config.get("snr_bands"):
        bins = config.get("bins", 257)
        # slice the encoder down to the log-magnitude rows only (tracker and
        # cep feature rows dropped) — the ablated model is numerically
        # different but structurally identical, which is all timing needs
        p_nofloor = dict(params, enc={"w": params["enc"]["w"][:bins],
                                      "b": params["enc"]["b"]})
        cfg_nf2 = dict(config, snr_bands=0, floor_feat=False, cep_feats=0)
        eng_nf = make_engine("mask_gru", cfg_nf2)
        st_nf = jax.device_put(eng_nf.init_state((B,)), dev)
        hold_nf = {"state": st_nf}

        def run_nofloor():
            hold_nf["state"], out = eng_nf.sequence_jit(
                p_nofloor, hold_nf["state"], hops)
            holder["out"] = out

        comp["no_tracker_ms"] = round(timed(run_nofloor, sync) * 1e3, 3)

    # (b) STFT+iSTFT alone at the same shape.
    from koala_tpu.ops import stft as stft_ops

    frames = 0.1 * jax.random.normal(key, (B, T, 512), jnp.float32)
    frames = jax.device_put(frames, dev)

    @_jax.jit
    def stft_istft(fr):
        re, im = stft_ops.stft_frame(fr)
        return stft_ops.istft_frame(re, im)

    def run_stft():
        holder["out"] = stft_istft(frames)

    comp["stft_istft_ms"] = round(timed(run_stft, sync) * 1e3, 3)

    # (c) lax.scan floor recurrence alone (the suspected serial bottleneck).
    nb = config.get("snr_bands") or 32
    lb = jax.device_put(jax.random.normal(key, (T, B, nb), jnp.float32), dev)

    @_jax.jit
    def floor_scan(lb_t):
        def f(fl, x):
            fl2 = jnp.minimum(fl + 0.012, x)
            return fl2, fl2

        return _jax.lax.scan(f, jnp.full((B, nb), 30.0), lb_t)[1]

    def run_floor():
        holder["out"] = floor_scan(lb)

    comp["floor_scan_ms"] = round(timed(run_floor, sync) * 1e3, 3)
    report["components"] = comp

    # -- 1c. HLO census of the compiled sequence program (VERDICT r4 weak
    # #2: look for layout/transpose waste). Counts the ops that move bytes
    # without computing (transpose/copy/reshape materializations).
    import re as _re

    lowered = jax.jit(engine.sequence).lower(params, state0, hops)
    hlo_text = lowered.compile().as_text()
    census = {}
    for opname in ("transpose", "copy", "convert", "fusion", "dot",
                   "custom-call", "dynamic-update-slice", "while"):
        census[opname] = len(_re.findall(r"^\s*\S+ = \S* %s" % opname,
                                         hlo_text, _re.M))
    # bytes moved by explicit transposes (shape like f32[512,376,384]{...})
    t_bytes = 0
    for m in _re.finditer(r"= (\w+)\[([\d,]*)\][^ ]* transpose", hlo_text):
        dtype, dims = m.group(1), m.group(2)
        if not dims:
            continue
        n = int(np.prod([int(d) for d in dims.split(",")]))
        t_bytes += n * {"f32": 4, "bf16": 2, "f16": 2, "s32": 4,
                        "pred": 1}.get(dtype, 4)
    census["transpose_bytes_mb"] = round(t_bytes / 1e6, 1)
    report["hlo_census"] = census
    print("hlo census:", census, flush=True)

    # -- 2. (batch, chunk) sweep ------------------------------------------
    sweep = []
    for b in (256, 512):
        for t in (188, 376, 752):
            st = jax.device_put(engine.init_state((b,)), dev)
            hp = jax.device_put(
                0.1 * jax.random.normal(key, (b, t, FRAME_LENGTH), jnp.float32),
                dev)
            hold = {"state": st}

            def run(hp=hp, hold=hold):
                hold["state"], out = engine.sequence_fast_jit(
                    params, hold["state"], hp)
                holder["out"] = out

            dt = timed(run, sync, iters=10)
            rate = b * t * FRAME_LENGTH / SAMPLE_RATE / dt
            sweep.append({"batch": b, "chunk_frames": t,
                          "audio_s_per_s": round(rate, 1),
                          "ms_per_chunk": round(dt * 1e3, 2)})
            print(sweep[-1], flush=True)
    report["sweep"] = sweep
    best = max(sweep, key=lambda r: r["audio_s_per_s"])
    report["best"] = best

    out_path = os.path.join(REPO, "resources", "reports", "engine_roofline.json")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report["kernel_roofline"]))
    print("best:", best, "-> wrote", out_path)


if __name__ == "__main__":
    main()
