"""Known quality gaps of the bundled model — the single source of truth.

Each entry is a gate the bundled model does NOT yet pass, with the value
measured at promotion (models/train_report.json). tests/test_parity.py
xfails exactly these (strict=False: they flip to XPASS→green the moment a
better model lands), and the CI model-gate accepts them only when invoked
with --allow-known-gaps. Everything NOT listed here is enforced.

Context (round 4): the bundled model passes the COMPLETE reference bar —
all three RMS harness cases at 0.02 on the reference fixtures (worst
frame 0.0080), SI-SDR +4.6 dB on the mix, STOI 0.917→0.912 (no
regression) — plus ALL THREE pseudo-real variants (-6 dB, 0.9x/1.1x
resample) and the am/colored/tonal battery kinds outright (band fails
only its SI-SDR-gain floor, not parity). The entries below are
residual-suppression gaps on the hardest synthetic battery kinds
(speech-like babble, clicks in speech gaps, LF rumble at the tolerance
boundary) measured against OUR OWN extended gates, which are stricter
than anything the reference tests.
"""

# (set_name, check) -> measured value at promotion.
# check: "parity" = a dev_pure_speech/dev_pure_noise/dev_mixed >= 0.02,
#        "si_sdr_gain" = gain <= 3 dB, "stoi" = regression > 0.01.
KNOWN_GAPS = {
    ("dev_heldout3:band", "si_sdr_gain"): 2.35,
    ("dev_heldout5:babble", "parity"): 0.0319,
    ("dev_heldout5:babble", "si_sdr_gain"): 1.52,
    ("dev_heldout6:impulsive", "parity"): 0.0262,
    ("dev_heldout7:rumble", "parity"): 0.0205,
    # Round-5 pseudo-real battery expansion (reverb/tilt/mu-law/level-mod;
    # VERDICT r4 #6): reverb and mu-law pass outright; the r4 bundle fails
    # the spectral-tilt and slow-fade channels (it never saw a non-default
    # channel in training — the device sampler now augments with random
    # tilt/level-modulation, so these are expected to close at the next
    # promotion).
    ("reference_tilt+3", "parity"): 0.1736,
    ("reference_tilt+3", "si_sdr_gain"): 2.98,
    ("reference_tilt+3", "stoi"): 0.0182,
    ("reference_tilt-3", "parity"): 0.1905,
    ("reference_tilt-3", "stoi"): 0.0212,
    ("reference_levelmod", "parity"): 0.0387,
}

# kind-name view for the battery-parameterized tests in test_parity.py:
# (kind, check) -> value measured at promotion. Tests use the value as a
# regression bound — a ledgered gap may stay ledgered, but it may not get
# WORSE than recorded (ADVICE r4: a bare xfail would let 0.0319 regress to
# 0.5 silently).
BATTERY_GAPS = {
    (name.split(":", 1)[1], check): value
    for (name, check), value in KNOWN_GAPS.items() if ":" in name
}


def regression_bound(check: str, recorded: float) -> float:
    """The worst value a ledgered gap may reach before it counts as a NEW
    regression (fails hard instead of xfailing). Parity/stoi metrics are
    smaller-is-better (allow 15% + eps slack over the recorded value);
    si_sdr_gain is bigger-is-better in dB (allow 0.5 dB below recorded)."""
    if check == "si_sdr_gain":
        return recorded - 0.5
    return recorded * 1.15 + 1e-4
