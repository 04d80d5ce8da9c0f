"""Known quality gaps of the bundled model — the single source of truth.

Each entry is a gate the bundled model does NOT yet pass, with the value
measured at promotion (models/train_report.json). tests/test_parity.py
xfails exactly these (strict=False: they flip to XPASS→green the moment a
better model lands), and the CI model-gate accepts them only when invoked
with --allow-known-gaps. Everything NOT listed here is enforced.

Context (round 5, second promotion): the bundled model is a two-member
weight soup (equal average of two sibling checkpoints warm-started from
the round-5 parent, seeds 2/4, trained with the widened +-4 dB/oct tilt
augmentation and distortion weight 26 — see DESIGN.md §8). It passes the
COMPLETE reference bar — all three RMS harness cases at 0.02 on the
reference fixtures (worst frame 0.0182), SI-SDR +4.7 dB on the mix, no
STOI regression — plus SIX of the eight pseudo-real invariance cases
outright (-6 dB, 0.9x/1.1x resample, reverb, mu-law, slow
level-modulation, and now tilt+3 parity, which the previous promotion
ledgered at 0.0321) and the am/colored/tonal battery kinds. Versus the
previous ledger: tilt+3 parity CLOSED, impulsive 0.0317 -> 0.0258,
band gain 2.31 -> 2.76, babble gain 1.36 -> 1.63, tilt+3 stoi
0.0196 -> 0.0119. The entries below are residual gaps against OUR OWN
extended gates, which are stricter than anything the reference tests:
the reference promises nothing about synthetic noise batteries or
+-9 dB channel tilts.
"""

# (set_name, check) -> measured value at promotion.
# check: "parity" = a dev_pure_speech/dev_pure_noise/dev_mixed >= 0.02,
#        "si_sdr_gain" = gain <= 3 dB, "stoi" = regression > 0.01.
KNOWN_GAPS = {
    ("dev_heldout3:band", "si_sdr_gain"): 2.7627,
    ("dev_heldout5:babble", "parity"): 0.0306,
    ("dev_heldout5:babble", "si_sdr_gain"): 1.6337,
    ("dev_heldout6:impulsive", "parity"): 0.0258,
    ("dev_heldout7:rumble", "parity"): 0.0208,
    # Spectral-tilt channels (+-3 dB/oct = +-9 dB across the band): the
    # round-4 model failed these at 0.17/0.19 parity; channel augmentation
    # cut that ~5x and the round-5 recipe closed tilt+3 parity entirely.
    # tilt-3 makes the MIX fundamentally harder (the LF boost drops input
    # SI-SDR from 8.5 to 0.4 dB), which is why its residual is the
    # largest left.
    ("reference_tilt+3", "si_sdr_gain"): 2.9356,
    ("reference_tilt+3", "stoi"): 0.0119,
    ("reference_tilt-3", "parity"): 0.0524,
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
