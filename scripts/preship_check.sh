#!/usr/bin/env bash
# Round-end / pre-ship gate (VERDICT r3 #8: never ship red again).
# Runs the full suite, the benchmark, and the bundled-model acceptance
# gates; writes the three outputs to resources/reports/preship/ and exits
# nonzero if ANY fails. The final commit of a round should quote this
# script's summary line.
set -u
cd "$(dirname "$0")/.."
mkdir -p resources/reports/preship
fail=0

echo "== pytest =="
python -m pytest tests/ -q 2>&1 | tail -2 | tee resources/reports/preship/pytest.txt
grep -qE "[0-9]+ passed" resources/reports/preship/pytest.txt || fail=1
# match real failures only ("N failed" / "N errors"), NOT "N xfailed"
grep -qE "[0-9]+ (failed|error)" resources/reports/preship/pytest.txt && fail=1

echo "== bench =="
if python bench.py > resources/reports/preship/bench.json 2> resources/reports/preship/bench.err; then
    tail -1 resources/reports/preship/bench.json
else
    echo "bench.py FAILED"; cat resources/reports/preship/bench.err | tail -5; fail=1
fi

echo "== model gate =="
if python scripts/train_model.py --eval-only --gate --allow-known-gaps --cpu \
        > resources/reports/preship/gate.txt 2>&1; then
    tail -1 resources/reports/preship/gate.txt
else
    echo "MODEL GATE FAILED"; grep "GATE FAIL" resources/reports/preship/gate.txt | head -10; fail=1
fi

if [ "$fail" -eq 0 ]; then
    echo "PRESHIP: ALL GREEN"
else
    echo "PRESHIP: RED — do not ship"
fi
exit $fail
