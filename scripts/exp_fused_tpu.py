"""Fused engine kernel on real TPU: compile + correctness vs CPU mirror."""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp
from koala_tpu.engine.core import make_engine
from koala_tpu.models import params_io

params, cfg = params_io.load_params("models/koala_params_tpu.pv")
engine = make_engine(cfg.get("kind", "mask_gru"), cfg)
B, T = 16, 16
rng = np.random.default_rng(0)
hops = (0.05 * rng.standard_normal((B, T, 256))).astype(np.float32)

# CPU mirror result
from koala_tpu.ops.pallas.engine_fused import fused_sequence_ref
cpu = jax.devices("cpu")[0]
with jax.default_device(cpu):
    st0 = engine.init_state((B,))
    _, out_ref = fused_sequence_ref(params, st0, jnp.asarray(hops), cfg)
    out_ref = np.asarray(out_ref)

dev = jax.devices()[0]
print("device:", dev)
p = jax.device_put(params, dev)
st = jax.device_put(engine.init_state((B,)), dev)
h = jax.device_put(jnp.asarray(hops), dev)
t0 = time.time()
st2, out = engine.sequence_fast_jit(p, st, h)
out = np.asarray(out)
print("compile+run %.1fs" % (time.time() - t0))
err = out - out_ref
sig = np.sum(out_ref**2)
print("agreement vs mirror: %.1f dB" % (10*np.log10(sig / max(np.sum(err**2), 1e-20))))
print("max abs err:", np.max(np.abs(err)))
