#!/usr/bin/env python3
"""Objective Difference Grade estimate on the BS.1387 loudness front end.

The reference conformance quality gate is a PEAQ delta: ODG of the test
chain may degrade at most 0.06 vs the ODG of the reference chain
(conformance/lc3_conformance.py:123-131, run_peaq at :559-571 shells out
to an external PEAQ binary that is not part of the package, and no PEAQ
implementation ships in this image either — zero egress).

This module derives an ODG estimate from the already-validated BS.1387
basic-model loudness front end (tools/mld.py, bit-matched to the C
conformance tool to 4 decimals): the per-frame summed specific-loudness
difference between reference and signal under test — the core of PEAQ's
noise-loudness MOVs — is aggregated as RMS over frames (the RmsNoiseLoud
aggregation) and mapped onto the ODG scale.

Mapping calibration (tools/odg.py history; tests/test_odg.py re-checks the
anchors): additive white noise on the 48 kHz test item measured through the
front end gives loudness-diff RMS ~0.004 / 0.13 / 0.76 / 2.65 / 6.9 at SNR
60/40/30/20/10 dB; anchoring those at ODG ~0 / -1 / -2 / -3 / -3.9
(imperceptible .. very annoying) fits

    ODG(rms) = -3.98 + 3.98 / (1 + (rms / 0.75) ** 0.75)

which is strictly monotone with no clamp and no dead zone: transparent
chains score ~-0.05, and a loudness-diff shift of ~0.03 around typical
codec operating points moves the estimate by the 0.06 delta criterion.
(The previous revision clamped at 0.0 behind a saturating sigmoid, which
mapped almost every chain to exactly 0.0 and made the delta gate vacuous —
ADVICE round 4.)

Scope note: this is the loudness-MOV subset of the 11-MOV basic model, not
ITU-R BS.1387 PEAQ (porting the full model needs the Annex 2 neural
weights plus a PEAQ oracle to validate against; the package ships neither
and the image has no network). It is labelled `odg_est` everywhere and the
conformance rows record `criterion: "odg-estimate"`.

Usage: python tools/odg.py ref.wav test.wav
"""
from __future__ import annotations

import sys

import numpy as np

from tools import mld as M

_R0 = 0.75   # loudness-diff RMS where the estimate crosses ODG -2
_P = 0.75    # power fitted on the SNR 40/30/20 anchors


def odg_from_rms(rms: float) -> float:
    """Map loudness-difference RMS onto the ODG scale (see module doc)."""
    return float(-3.98 + 3.98 / (1.0 + (max(rms, 0.0) / _R0) ** _P))


def odg_from_loudness(ref: np.ndarray, test: np.ndarray) -> float:
    """ODG estimate from per-frame summed |specific loudness difference|
    (the mld.py pipeline, peaq.c:120-420) aggregated as RMS over frames."""
    n = min(len(ref), len(test))
    lr = M.loudness_patterns(ref[:n])
    lt = M.loudness_patterns(test[:n])
    m = min(len(lr), len(lt))
    if m == 0:
        return 0.0
    d = np.abs(lr[:m] - lt[:m]).sum(axis=1)
    rms = float(np.sqrt(np.mean(d * d)))
    return odg_from_rms(rms)


def odg_est(ref_pcm: np.ndarray, test_pcm: np.ndarray, fs: int) -> float:
    """ODG estimate for int16 PCM at fs (resampled to 48 kHz like the C
    conformance flow resamples all material, lc3_conformance.py:575 —
    96 kHz HR output is downsampled, not reinterpreted)."""
    r = M.resample_48k(ref_pcm.astype(np.float64) / 32768.0, fs)
    t = M.resample_48k(test_pcm.astype(np.float64) / 32768.0, fs)
    return odg_from_loudness(r, t)


def main() -> int:
    from audio_codec_tpu.utils import wavio
    a, fs_a = wavio.read_wav(sys.argv[1])
    b, fs_b = wavio.read_wav(sys.argv[2])
    assert fs_a == fs_b
    print(f"odg_est {odg_est(a[:, 0], b[:, 0], fs_a):.3f}")
    return 0


if __name__ == "__main__":
    sys.path.insert(0, str(__import__("pathlib").Path(__file__).parent.parent))
    main()
