"""Weight-soup search over sibling checkpoints (round-5 promotion workflow).

Usage: python scripts/soup_search.py NAME=WEIGHT:PATH,WEIGHT:PATH,... ...

Each argument defines one soup candidate as a weighted average of model
files (same-basin EMA checkpoints — DESIGN.md §8). Every candidate is
evaluated on the full 17-set battery (CPU jax, no TPU contention) and its
gate/ledger delta vs tests/known_gaps.py is printed; reports land in
resources/ckpts/report_<NAME>.json, blobs in resources/ckpts/<NAME>.pv.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "scripts"))

import jax
jax.config.update("jax_platforms", "cpu")

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def soup(members):
    from koala_tpu.models import params_io

    acc, cfg0 = None, None
    for w, path in members:
        params, cfg = params_io.load_params(path)
        if acc is None:
            acc = jax.tree_util.tree_map(lambda x: np.asarray(x) * w, params)
            cfg0 = cfg
        else:
            acc = jax.tree_util.tree_map(
                lambda a, x: a + np.asarray(x) * w, acc, params)
    return acc, cfg0


def summarize(name, results):
    sys.path.insert(0, os.path.join(REPO, "tests"))
    from known_gaps import KNOWN_GAPS
    from ledger_from_report import gaps

    fails = gaps(results)
    new = {k: v for k, v in fails.items() if k not in KNOWN_GAPS}
    closed = [k for k in KNOWN_GAPS if k not in fails]
    print("== %s: %d fails (%d new, %d ledger-closed)"
          % (name, len(fails), len(new), len(closed)))
    for k, v in sorted(fails.items()):
        tag = ("LEDGER %.4f" % KNOWN_GAPS[k]) if k in KNOWN_GAPS else "NEW"
        print("   %-44s %.4f  %s" % (str(k), v, tag))
    for k in closed:
        print("   CLOSED: %s (was %.4f)" % (str(k), KNOWN_GAPS[k]))
    return len(new), len(fails)


def main():
    from koala_tpu.models import params_io
    from train_model import eval_all

    for spec in sys.argv[1:]:
        name, rest = spec.split("=", 1)
        members = []
        for part in rest.split(","):
            w, path = part.split(":", 1)
            members.append((float(w), path))
        total = sum(w for w, _ in members)
        members = [(w / total, p) for w, p in members]
        params, cfg = soup(members)
        blob = os.path.join(REPO, "resources", "ckpts", name + ".pv")
        params_io.save_params(blob, params, cfg)
        results = eval_all(params, cfg)
        rp = os.path.join(REPO, "resources", "ckpts", "report_%s.json" % name)
        with open(rp, "w") as f:
            json.dump(results, f, indent=1)
        summarize(name, results)
        print("blob -> %s, report -> %s" % (blob, rp), flush=True)


if __name__ == "__main__":
    main()
