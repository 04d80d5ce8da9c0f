"""Multi-process jax.distributed smoke: 2 host processes, one global mesh.

The reference is single-process (SURVEY.md §2: no distributed backend);
this is the framework's own north star (BASELINE.json: multi-host scaling).
The test launches two coordinator-connected processes on the CPU backend
(Gloo collectives), runs the sharded enhancement path over the 4-device
global mesh (2 local devices per process), and checks both processes see
the same psum-reduced checksum as a single-process reference run.
"""

import os
import socket
import subprocess
import sys
import textwrap

import numpy as np
import pytest

_WORKER = textwrap.dedent("""
    import os, sys
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               .replace("--xla_force_host_platform_device_count=8", "")
                               + " --xla_force_host_platform_device_count=2").strip()
    import jax
    jax.config.update("jax_platforms", "cpu")
    pid = int(sys.argv[1]); port = sys.argv[2]
    jax.distributed.initialize(coordinator_address="127.0.0.1:" + port,
                               num_processes=2, process_id=pid)
    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    sys.path.insert(0, os.getcwd())
    from koala_tpu.engine.core import make_engine
    from koala_tpu.models import mmse

    assert jax.device_count() == 4 and jax.local_device_count() == 2
    engine = make_engine("mmse", mmse.DEFAULT_CONFIG)
    params = mmse.init_params(jax.random.PRNGKey(0))

    B, T = 8, 6            # global batch; each process feeds 4 utterances
    rng = np.random.default_rng(7)
    hops_global = 0.1 * rng.standard_normal((B, T, 256)).astype(np.float32)
    local = hops_global[pid * (B // 2):(pid + 1) * (B // 2)]

    mesh = Mesh(np.array(jax.devices()), ("data",))
    sh = NamedSharding(mesh, P("data"))
    hops = jax.make_array_from_process_local_data(sh, local)
    state = jax.device_put(engine.init_state((B,)), sh)

    def fn(params, state, hops):
        _, out = engine.sequence(params, state, hops)
        return jnp.sum(jnp.abs(out))      # scalar -> replicated output

    checksum = jax.jit(fn, out_shardings=NamedSharding(mesh, P()))(
        params, state, hops)
    print("CHECKSUM %.6f" % float(checksum), flush=True)
""")


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_distributed_enhancement_matches_single():
    port = str(_free_port())
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    procs = [
        subprocess.Popen([sys.executable, "-c", _WORKER, str(i), port],
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                         text=True, env=env, cwd=os.path.dirname(
                             os.path.dirname(os.path.abspath(__file__))))
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=240)
        assert p.returncode == 0, out[-2000:]
        outs.append(out)

    checks = []
    for out in outs:
        lines = [ln for ln in out.splitlines() if ln.startswith("CHECKSUM ")]
        assert lines, out[-2000:]
        checks.append(float(lines[0].split()[1]))
    # both processes agree on the global result
    assert checks[0] == pytest.approx(checks[1], rel=1e-6)

    # single-process reference
    import jax
    import jax.numpy as jnp

    from koala_tpu.engine.core import make_engine
    from koala_tpu.models import mmse

    engine = make_engine("mmse", mmse.DEFAULT_CONFIG)
    params = mmse.init_params(jax.random.PRNGKey(0))
    rng = np.random.default_rng(7)
    hops = 0.1 * rng.standard_normal((8, 6, 256)).astype(np.float32)
    _, out = engine.sequence(params, engine.init_state((8,)), jnp.asarray(hops))
    ref = float(jnp.sum(jnp.abs(out)))
    assert checks[0] == pytest.approx(ref, rel=1e-4)
