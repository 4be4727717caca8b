"""Fast training-dynamics CANARY: a 5-step replay of the deterministic
stage-2 loss curve against its stored golden (tools/loss_curve.py).  Any
unintended change to losses, LR schedule, bank updates, or the data
synthesizer shows up here.  This is the quick-tier guard only — the
authoritative 100-step reference-parity replays live in
tests/test_ref_parity.py (slow-marked).  Regenerate deliberately with:
  python -c "..." (see tools/loss_curve.py docstring)
"""

import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

GOLDEN_PATH = os.path.join(os.path.dirname(__file__), "golden",
                           "loss_curve_r1.json")
GOLDEN_PN_PATH = os.path.join(os.path.dirname(__file__), "golden",
                              "loss_curve_pn_r5.json")


def test_curve_matches_golden():
    from loss_curve import run_curve

    with open(GOLDEN_PATH) as f:
        golden = json.load(f)
    curve = run_curve(steps=5, seed=golden["seed"])
    np.testing.assert_allclose(curve, golden["curve"][:5], rtol=1e-4)


def test_pn_curve_matches_golden():
    """HRNetPN training-dynamics canary (VERDICT r4 item 8): a 5-step
    replay of the stored stage-2 HRNetPN golden (depth2pts -> PN -> NCE
    through the full jitted step at CPU-tiny shapes).  Regenerate:
    python tools/loss_curve.py --arch HRNetPN --steps 8 --out
    tests/golden/loss_curve_pn_r5.json (forced-CPU)."""
    from loss_curve import run_curve

    with open(GOLDEN_PN_PATH) as f:
        golden = json.load(f)
    curve = run_curve(steps=5, seed=golden["seed"], arch="HRNetPN")
    np.testing.assert_allclose(curve, golden["curve"][:5], rtol=1e-4)


def test_pn_curve_decreases():
    with open(GOLDEN_PN_PATH) as f:
        golden = json.load(f)
    c = golden["curve"]
    assert np.mean(c[-3:]) < np.mean(c[:3])


def test_curve_decreases():
    with open(GOLDEN_PATH) as f:
        golden = json.load(f)
    c = golden["curve"]
    assert np.mean(c[-3:]) < np.mean(c[:3])
