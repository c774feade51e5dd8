"""ODG-estimate validation (tools/odg.py): the mapping must be monotone,
dead-zone-free and calibrated to the additive-noise anchors it was fitted
on (no PEAQ oracle ships in this image — the reference shells out to an
external binary, lc3_conformance.py:559-571 — so the anchors are the
committed validation set; ADVICE r4 flagged the previous clamp-at-0.0
mapping as vacuous)."""
from __future__ import annotations

import numpy as np
import pytest

from tools import odg as O


def _tone_mix(n, fs=48000, seed=3):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / fs
    x = sum(np.sin(2 * np.pi * f * t + rng.uniform(0, 6.28))
            for f in (220, 440, 880, 1760, 3520))
    x += 0.1 * rng.standard_normal(n)
    return (0.3 * x / np.abs(x).max()).astype(np.float64)


def test_identical_is_zero():
    x = _tone_mix(48000)
    assert O.odg_from_loudness(x, x) == pytest.approx(0.0, abs=1e-9)


def test_monotone_snr_ladder_no_dead_zone():
    x = _tone_mix(48000)
    rng = np.random.default_rng(7)
    vals = []
    for snr in (60, 40, 30, 20, 10):
        nz = rng.standard_normal(len(x)) * np.sqrt(np.mean(x ** 2)) \
            * 10 ** (-snr / 20)
        vals.append(O.odg_from_loudness(x, x + nz))
    # strictly decreasing — no dead zone anywhere on the ladder
    assert all(a > b for a, b in zip(vals, vals[1:])), vals
    # calibration anchors (module doc): imperceptible .. very annoying
    assert -0.35 < vals[0] < 0.0          # SNR 60: near-transparent
    assert -2.0 < vals[1] < -0.35         # SNR 40: perceptible
    assert vals[3] < -2.2                 # SNR 20: annoying
    assert vals[4] < -3.0                 # SNR 10: very annoying


def test_delta_sensitivity():
    """A small distortion increase must move the estimate by more than the
    0.06 conformance delta — the round-4 mapping mapped both chains to
    exactly 0.0 and the gate never fired."""
    x = _tone_mix(48000)
    rng = np.random.default_rng(11)
    nz = rng.standard_normal(len(x)) * np.sqrt(np.mean(x ** 2))
    a = O.odg_from_loudness(x, x + nz * 10 ** (-40 / 20))
    b = O.odg_from_loudness(x, x + nz * 10 ** (-37 / 20))  # 3 dB worse
    assert a - b > 0.06


def test_mapping_shape():
    assert O.odg_from_rms(0.0) == pytest.approx(0.0)
    assert O.odg_from_rms(1e9) == pytest.approx(-3.98, abs=1e-3)
    r = np.linspace(0, 8, 100)
    v = np.array([O.odg_from_rms(x) for x in r])
    assert (np.diff(v) < 0).all()
