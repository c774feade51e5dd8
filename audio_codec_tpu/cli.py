"""ETSI-compatible command-line interface for the TPU codec.

Drop-in analog of the reference CLI (codec_exe.c:141-520): WAV in/out, the
reference's bitstream container (and G.192), -E/-D/encode+decode modes, frame
length selection, bitrate switching files, error pattern files for PLC tests.
The stock conformance harness only needs exe paths, so this CLI lets
`lc3_conformance.py` drive the TPU build unmodified (SURVEY.md §7).

Usage:  python -m audio_codec_tpu.cli [OPTIONS] INPUT OUTPUT BITRATE
"""
from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np


def _parse_args(argv):
    p = argparse.ArgumentParser(prog="audio_codec_tpu",
                                description="TPU-native LC3plus codec")
    p.add_argument("-E", action="store_true", help="encode only")
    p.add_argument("-D", action="store_true", help="decode only")
    p.add_argument("-q", action="store_true", help="quiet")
    p.add_argument("-bps", type=int, default=16)
    p.add_argument("-swf", type=str, default=None, help="bitrate switching file")
    p.add_argument("-dc", type=int, default=1)
    p.add_argument("-frame_ms", type=float, default=10.0)
    p.add_argument("-epf", type=str, default=None, help="error pattern file (frame loss)")
    p.add_argument("-epmode", type=int, default=0,
                   help="error protection mode 0..4 (channel coder)")
    p.add_argument("-epmr", type=int, default=0,
                   help="error protection mode request signaled to the decoder")
    p.add_argument("-formatG192", action="store_true")
    p.add_argument("input")
    p.add_argument("output")
    p.add_argument("bitrate", nargs="?", default="0")
    return p.parse_args(argv)


def _read_error_pattern(path: str) -> np.ndarray:
    """Binary 16-bit pattern file: nonzero = frame lost (codec_exe.c:99-102)."""
    return np.fromfile(path, dtype="<i2") != 0


def _delay_samples(cfg) -> int:
    """Algorithmic delay trimmed by the CLI (lc3_enc_get_delay analog)."""
    return {25: 2, 50: 2.5, 100: 2.5}[cfg.frame_dms] * cfg.fs // 1000 * 2 // 2


def main(argv=None) -> int:
    args = _parse_args(argv if argv is not None else sys.argv[1:])
    import jax.numpy as jnp
    from .config import Config
    from .engine import StreamEncoder, StreamDecoder
    from .utils import bitstream_io as bio
    from .utils import wavio

    encode = not args.D
    decode = not args.E

    if encode:
        pcm, fs = wavio.read_wav(args.input)
        n_samples, channels = pcm.shape
        if args.swf:
            rates = np.loadtxt(args.swf, ndmin=1).astype(np.int64)
        else:
            rates = np.array([int(args.bitrate)])
        cfg0 = Config(fs_in=fs, bitrate=int(rates[0]),
                      frame_dms=int(args.frame_ms * 10), channels=channels,
                      epmode=args.epmode)
        enc = StreamEncoder(cfg0, n_streams=channels)
        enc.epmr = args.epmr
        frames_out = []
        fl = cfg0.frame_length
        n_frames = n_samples // fl
        for f in range(n_frames):
            if args.swf:
                enc.set_bitrate(int(rates[f % len(rates)]))
            block = pcm[f * fl: (f + 1) * fl].T  # [channels, fl]
            payloads = enc.encode(block)
            frames_out.append(b"".join(payloads))
        out_path = Path(args.output)
        bs_frames = frames_out
        if not decode:
            h = bio.StreamHeader(samplerate=fs, bitrate=int(rates[0]),
                                 channels=channels, frame_ms=args.frame_ms,
                                 epmode=args.epmode, signal_len=n_samples,
                                 hrmode=1 if cfg0.hrmode and fs >= 48000 and cfg0.fs_idx == 5 else 0)
            if args.formatG192:
                with open(out_path, "wb") as fo:
                    for fr in bs_frames:
                        bio.write_g192_frame(fo, fr)
                cfgp = out_path.with_suffix(out_path.suffix + ".cfg")
                with open(cfgp, "wb") as fo:
                    bio.write_header(fo, h)
            else:
                bio.write_all(out_path, h, bs_frames)
            if not args.q:
                print(f"encoded {n_frames} frames -> {out_path}")
            return 0

    if decode and not encode:
        if args.formatG192:
            cfgp = Path(args.input + ".cfg")
            if not cfgp.exists():
                cfgp = Path(args.input).with_suffix(".cfg")
            with open(cfgp, "rb") as fh:
                h = bio.read_header(fh)
            frames, bfi_flags = [], []
            with open(args.input, "rb") as fh:
                while True:
                    fr, bf = bio.read_g192_frame(fh)
                    if fr is None:
                        break
                    frames.append(fr)
                    bfi_flags.append(bf)
        else:
            h, frames = bio.read_all(args.input)
            bfi_flags = [0] * len(frames)
        cfg = Config(fs_in=h.samplerate, bitrate=h.bitrate,
                     frame_dms=int(h.frame_ms * 10), channels=h.channels,
                     epmode=4 if h.epmode else 0)  # mode detected per frame
        lost = np.zeros(len(frames), bool)
        if args.epf:
            pat = _read_error_pattern(args.epf)
            lost = np.resize(pat, len(frames))
        dec = StreamDecoder(cfg, n_streams=h.channels)
        out = []
        for i, fr in enumerate(frames):
            bfi = bfi_flags[i]
            if bool(lost[i]) or len(fr) == 0:
                bfi = 1
            pcm = dec.decode(fr, bfi=bfi)
            out.append(pcm.T)
        pcm = np.concatenate(out, axis=0)
        delay = cfg.frame_length - 2 * cfg.la_zeroes  # lc3_enc_get_delay
        pcm = pcm[delay: delay + h.signal_len if h.signal_len else None]
        wavio.write_wav(args.output, pcm, h.samplerate,
                        sampwidth=2 if args.bps == 16 else (args.bps // 8))
        if not args.q:
            print(f"decoded {len(frames)} frames -> {args.output}")
        return 0

    if encode and decode:
        # encdec mode: encode then immediately decode in-process
        cfg = cfg0
        dec = StreamDecoder(cfg, n_streams=channels)
        out = []
        for fr in frames_out:
            out.append(dec.decode(fr, bfi=False).T)
        pcm_out = np.concatenate(out, axis=0)
        delay = cfg.frame_length - 2 * cfg.la_zeroes
        pcm_out = pcm_out[delay: delay + n_samples]
        wavio.write_wav(args.output, pcm_out, fs)
        return 0
    return 1


if __name__ == "__main__":
    sys.exit(main())
