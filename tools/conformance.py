#!/usr/bin/env python3
"""Mini conformance harness for the TPU LC3plus codec.

Models the reference harness (conformance/lc3_conformance.py, SURVEY.md §4)
using the bundled testvec material (the SQAM corpus needs network access):
for each operating point it runs three modes

  encode : our encoder + ETSI decoder  vs  ETSI encoder + ETSI decoder
  decode : ETSI encoder + our decoder  vs  ETSI encoder + ETSI decoder
  encdec : our encoder + our decoder   vs  ETSI encoder + ETSI decoder

and scores them with the reference RMS metric (conformance/tools/rms.c):
samples scaled to [-1, 1), RMS in dB, `reached bits` = largest k with
rms < 20*log10(2^-(k-1)/sqrt(12)).  Decode passes at >= 14 bits (official
criterion); encode/encdec are scored on SNR-vs-source parity with the
reference chain (BASELINE.md north star: quality >= reference encoder).

Usage: python tools/conformance.py [--points N] [--frames N] [--json out.json]
"""
from __future__ import annotations

import argparse
import json
import subprocess
import sys
import tempfile
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

POINTS = [
    ("thetest8", 8000, 32000, 100),
    ("thetest16", 16000, 32000, 100),
    ("thetest24", 24000, 48000, 100),
    ("thetest32", 32000, 64000, 100),
    ("thetest48", 48000, 64000, 100),
    ("thetest48", 48000, 96000, 100),
    ("thetest48", 48000, 128000, 100),
    ("thetest16", 16000, 32000, 50),
    ("thetest48", 48000, 128000, 50),
]


def rms_metric(a: np.ndarray, b: np.ndarray) -> tuple[float, int]:
    """(rms_db, reached_bits) per conformance/tools/rms.c:145-331."""
    n = min(len(a), len(b))
    d = a[:n].astype(np.float64) / 32768.0 - b[:n].astype(np.float64) / 32768.0
    rms = float(np.sqrt(np.sum(d * d) / max(n, 1)))
    rms_db = 20 * np.log10(max(rms, 1e-12))
    bits = 0
    for k in range(16, 0, -1):
        if rms_db < 20 * np.log10(2.0 ** (-(k - 1)) / np.sqrt(12.0)):
            bits = k
            break
    return rms_db, bits


def snr_vs(src: np.ndarray, dec: np.ndarray) -> float:
    n = min(len(src), len(dec))
    e = dec[:n].astype(np.float64) - src[:n].astype(np.float64)
    sig = np.sqrt(np.mean(src[:n].astype(np.float64) ** 2))
    return 20 * np.log10(sig / max(np.sqrt(np.mean(e * e)), 1e-9))


def run_point(wav: str, fs: int, bitrate: int, frame_dms: int, n_frames: int,
              work: Path) -> dict:
    import jax.numpy as jnp
    from audio_codec_tpu.config import Config
    from audio_codec_tpu.engine import _dec_step, _enc_step
    from audio_codec_tpu.models import decoder as dec_m
    from audio_codec_tpu.models import state as S
    from audio_codec_tpu.utils import bitstream_io as bio
    from tests import oracle

    cfg = Config(fs_in=fs, bitrate=bitrate, frame_dms=frame_dms)
    pcm, _ = oracle.read_wav_mono(oracle.TESTVEC / f"{wav}.wav")
    fl = cfg.frame_length
    nf = min(n_frames, len(pcm) // fl)
    x = pcm[: nf * fl, 0].reshape(nf, fl).astype(np.float32)
    src = x.ravel().astype(np.int64)
    tag = f"{wav}_{bitrate}_{frame_dms}"

    def etsi(mode, inp, outp, rate):
        args = [str(oracle.ORACLE_FL), "-q", mode]
        if frame_dms != 100:
            args += ["-frame_ms", str(frame_dms / 10)]
        args += [str(inp), str(outp), str(rate)]
        subprocess.run(args, check=True, capture_output=True)

    # reference chain
    src_wav = work / f"{tag}_src.wav"
    from audio_codec_tpu.utils import wavio
    wavio.write_wav(src_wav, x.ravel().astype(np.int16), fs)
    ref_bin = work / f"{tag}_ref.bin"
    ref_wav = work / f"{tag}_ref.wav"
    etsi("-E", src_wav, ref_bin, bitrate)
    etsi("-D", ref_bin, ref_wav, 0)
    ref_dec, _ = oracle.read_wav_mono(ref_wav)
    ref_dec = ref_dec[:, 0]

    # our encoder
    enc = _enc_step(cfg)
    st = S.enc_state_init(cfg, 1)
    frames = []
    for f in range(nf):
        st, out, _ = enc(st, jnp.asarray(x[f][None]))
        frames.append(np.asarray(out)[0].tobytes())
    ours_bin = work / f"{tag}_ours.bin"
    bio.write_all(ours_bin, bio.StreamHeader(samplerate=fs, bitrate=bitrate,
                                             channels=1, frame_ms=frame_dms / 10,
                                             epmode=0, signal_len=nf * fl), frames)
    enc_wav = work / f"{tag}_enc.wav"
    etsi("-D", ours_bin, enc_wav, 0)
    enc_dec, _ = oracle.read_wav_mono(enc_wav)
    enc_dec = enc_dec[:, 0]

    # our decoder over both bitstreams
    def our_decode(frames_list):
        dst = S.dec_state_init(cfg, 1)
        dstep = _dec_step(cfg)
        nobfi = jnp.zeros((1,), jnp.int32)
        outs = []
        for fr in frames_list:
            dst, y, _ = dstep(dst, jnp.asarray(np.frombuffer(fr, np.uint8)[None]),
                              nobfi)
            outs.append(np.asarray(dec_m.round_pcm(y))[0])
        delay = cfg.frame_length - 2 * cfg.la_zeroes  # lc3_enc_get_delay
        return np.concatenate(outs)[delay:]

    _, ref_frames = bio.read_all(ref_bin)
    dec_out = our_decode(ref_frames)
    encdec_out = our_decode(frames)

    rms_dec, bits_dec = rms_metric(ref_dec, dec_out)
    rms_enc, bits_enc = rms_metric(ref_dec, enc_dec)
    rms_ed, bits_ed = rms_metric(ref_dec, encdec_out)
    return {
        "point": tag,
        "decode": {"rms_db": round(rms_dec, 1), "bits": bits_dec,
                   "pass": bits_dec >= 14},
        "encode": {"rms_db": round(rms_enc, 1),
                   "snr_ref": round(snr_vs(src, ref_dec), 2),
                   "snr_ours": round(snr_vs(src, enc_dec), 2),
                   "pass": snr_vs(src, enc_dec) >= snr_vs(src, ref_dec) - 0.5},
        "encdec": {"rms_db": round(rms_ed, 1),
                   "snr_ours": round(snr_vs(src, encdec_out), 2),
                   "pass": snr_vs(src, encdec_out) >= snr_vs(src, ref_dec) - 0.5},
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--points", type=int, default=len(POINTS))
    ap.add_argument("--frames", type=int, default=100)
    ap.add_argument("--json", type=str, default=None)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", str(REPO / ".cache/jax"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    from tests import oracle
    oracle.ensure_oracle()

    results = []
    with tempfile.TemporaryDirectory() as td:
        for wav, fs, br, dms in POINTS[: args.points]:
            r = run_point(wav, fs, br, dms, args.frames, Path(td))
            results.append(r)
            ok = all(r[m]["pass"] for m in ("decode", "encode", "encdec"))
            print(f"{r['point']:>24}: decode {r['decode']['bits']}bit "
                  f"({r['decode']['rms_db']}dB) | enc snr {r['encode']['snr_ours']} "
                  f"vs ref {r['encode']['snr_ref']} | encdec snr "
                  f"{r['encdec']['snr_ours']} => {'PASS' if ok else 'FAIL'}")
    n_pass = sum(all(r[m]["pass"] for m in ("decode", "encode", "encdec"))
                 for r in results)
    print(f"conformance: {n_pass}/{len(results)} operating points pass")
    if args.json:
        Path(args.json).write_text(json.dumps(results, indent=2))
    return 0 if n_pass == len(results) else 1


if __name__ == "__main__":
    sys.exit(main())
