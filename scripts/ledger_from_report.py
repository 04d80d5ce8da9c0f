"""Emit the tests/known_gaps.py KNOWN_GAPS dict for a candidate report.

Usage: python scripts/ledger_from_report.py report.json

Prints the residual-gap entries (every gate the candidate fails, with its
measured value) in the exact literal format known_gaps.KNOWN_GAPS uses —
the promote workflow is: promote_model.py, then paste this output into
tests/known_gaps.py so the ledger matches the bundled model precisely.
"""

import json
import sys


def gaps(report: dict) -> dict:
    out = {}
    for name, m in sorted(report.items()):
        worst = max(m["dev_pure_speech"], m["dev_pure_noise"], m["dev_mixed"])
        if worst >= 0.02:
            out[(name, "parity")] = round(worst, 4)
        if m["si_sdr_gain_db"] <= 3.0:
            out[(name, "si_sdr_gain")] = round(m["si_sdr_gain_db"], 4)
        reg = m["stoi_input"] - m["stoi_mixed"]
        if reg >= 0.01:
            out[(name, "stoi")] = round(reg, 4)
    return out


def main():
    report = json.load(open(sys.argv[1]))
    print("KNOWN_GAPS = {")
    for (name, check), value in gaps(report).items():
        print('    ("%s", "%s"): %.4f,' % (name, check, value))
    print("}")


if __name__ == "__main__":
    main()
