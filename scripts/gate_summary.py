"""Summarize a train_model.py --report JSON against the acceptance gates.

Usage: python scripts/gate_summary.py report.json [report2.json ...]
"""

import json
import sys


def summarize(path: str) -> int:
    r = json.load(open(path))
    fails = 0
    print("== %s" % path)
    for name, m in r.items():
        bad = []
        for key in ("dev_pure_speech", "dev_pure_noise", "dev_mixed"):
            if m[key] >= 0.02:
                bad.append("%s=%.4f" % (key, m[key]))
        if m["si_sdr_gain_db"] <= 3.0:
            bad.append("gain=%.2f" % m["si_sdr_gain_db"])
        if m["stoi_mixed"] <= m["stoi_input"] - 0.01:
            bad.append("stoi %.3f->%.3f" % (m["stoi_input"], m["stoi_mixed"]))
        status = "PASS" if not bad else "FAIL " + " ".join(bad)
        print("  %-26s %s" % (name, status))
        fails += bool(bad)
    ref = r.get("reference", {})
    print("  fails: %d  ref si_sdr=%.2f sp=%.4f stoi %.3f->%.3f" % (
        fails, ref.get("si_sdr_mixed_db", -1), ref.get("dev_pure_speech", -1),
        ref.get("stoi_input", -1), ref.get("stoi_mixed", -1)))
    return fails


if __name__ == "__main__":
    total = sum(summarize(p) for p in sys.argv[1:])
    sys.exit(1 if total else 0)
