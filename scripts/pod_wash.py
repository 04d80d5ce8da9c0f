"""Pod-scale corpus wash (BASELINE.json config 5): enhance a large noisy
corpus utterance-parallel over every chip of every host, and report
throughput + scaling efficiency.

Single-host:   python scripts/pod_wash.py --utterances 1024
Multi-host:    launch once per host with the jax.distributed env
               (COORDINATOR_ADDRESS, NUM_PROCESSES, PROCESS_ID set), or
               rely on cloud-TPU auto-detection; the script calls
               jax.distributed.initialize() when NUM_PROCESSES > 1.
CPU smoke:     KOALA_POD_CPU_DEVICES=8 python scripts/pod_wash.py ...

Efficiency report: audio-s/s per chip at N chips vs 1 chip (measured by
also timing a single-device run when --efficiency is passed).
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--utterances", type=int, default=512)
    ap.add_argument("--utterance-seconds", type=float, default=4.0)
    ap.add_argument("--batch", type=int, default=None,
                    help="global batch (default: all chips x 64)")
    ap.add_argument("--model_path", default=None)
    ap.add_argument("--efficiency", action="store_true",
                    help="also run single-device to compute scaling efficiency")
    ap.add_argument("--snr-db", type=float, default=5.0)
    args = ap.parse_args()

    n_cpu = os.environ.get("KOALA_POD_CPU_DEVICES")
    if n_cpu:
        os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                                   + f" --xla_force_host_platform_device_count={n_cpu}").strip()
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax

    if int(os.environ.get("NUM_PROCESSES", "1")) > 1:
        jax.distributed.initialize(
            coordinator_address=os.environ["COORDINATOR_ADDRESS"],
            num_processes=int(os.environ["NUM_PROCESSES"]),
            process_id=int(os.environ["PROCESS_ID"]))

    import numpy as np

    from koala_tpu.constants import FRAME_LENGTH, SAMPLE_RATE
    from koala_tpu.models.params_io import default_model_path
    from koala_tpu.parallel import make_mesh
    from koala_tpu.parallel.runner import CorpusRunner
    from koala_tpu.profiling import machine_state
    from koala_tpu.train.data import synth_noise

    model_path = args.model_path or default_model_path()

    samples = int(args.utterance_seconds * SAMPLE_RATE)
    samples = (samples // FRAME_LENGTH) * FRAME_LENGTH

    # Synthetic noisy corpus (speech-shaped pink noise + white noise mix);
    # in production this is the user's utterance list.
    rng = np.random.default_rng(0)
    print("machine state:", json.dumps(machine_state()), flush=True)

    def run_on(mesh, tag):
        n_dev = mesh.devices.size
        batch = args.batch or n_dev * 64
        # keep at least 2 batches so the warmup batch absorbs compilation
        batch = min(batch, (args.utterances // (2 * n_dev)) * n_dev) or n_dev
        runner = CorpusRunner(model_path, batch, samples, mesh)

        def batches():
            total = (args.utterances // batch) * batch
            for i in range(0, total, batch):
                speech = rng.standard_normal((batch, samples)).astype(np.float32) * 0.05
                noise = np.stack([synth_noise(rng, samples, "pink") for _ in range(1)])
                noise = np.repeat(noise, batch, axis=0).astype(np.float32)
                yield speech + noise * 0.05 * 10 ** (-args.snr_db / 20.0)

        n_batches = args.utterances // batch
        report = runner.wash(batches(), warmup=1 if n_batches > 1 else 0)
        report["tag"] = tag
        print(json.dumps(report), flush=True)
        return report

    full_mesh = make_mesh()
    report = run_on(full_mesh, "all-devices")

    if args.efficiency and full_mesh.devices.size > 1:
        single = run_on(make_mesh(list(full_mesh.devices.flat)[:1]), "one-device")
        # Two views, because they answer different questions:
        # - scaling_efficiency (per-chip at N chips vs 1): the real-hardware
        #   number, meaningful when each mesh device is a distinct chip.
        # - aggregate_retention (sharded aggregate / single-device aggregate
        #   on the SAME hardware): the honest number on a virtual CPU mesh,
        #   where N "devices" timeshare the host cores so per-chip
        #   throughput necessarily divides by N. Retention isolates the
        #   partitioning/collective overhead, which is what the virtual
        #   mesh can actually evidence.
        eff = (report["audio_seconds_per_second_per_chip"]
               / max(single["audio_seconds_per_second_per_chip"], 1e-9))
        retention = (report["audio_seconds_per_second"]
                     / max(single["audio_seconds_per_second"], 1e-9))
        print(json.dumps({
            "metric": "scaling_efficiency",
            "chips": int(full_mesh.devices.size),
            "value": round(eff, 4),
            "aggregate_retention": round(retention, 4),
            "virtual_cpu_mesh": bool(n_cpu),
        }), flush=True)


if __name__ == "__main__":
    main()
