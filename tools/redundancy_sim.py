#!/usr/bin/env python3
"""Application-layer redundancy simulator — Python port of the reference
tools/lc3plus_redundancy_simulator.pl.

Two G.192 streams of the same audio (a primary and a lower-rate
'help'/redundant stream, the redundant payload carried `offset` packets
later) are merged under a frame-loss pattern: a lost primary packet is
replaced by the redundant payload, marked as a G.192 redundancy frame
(sync 0x6B22 -> the decoder treats it as fully suspect, bfi=3 /
partial concealment, dec_lc3.c:105-112); when the redundant copy is also
lost the frame is emitted as a bad frame and the decoder runs PLC.

Usage:
  python tools/redundancy_sim.py MAIN.g192 HELP.g192 EPF OUT.g192 \
         [--offset N] [--signal 3]
"""
from __future__ import annotations

import argparse
import shutil
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from audio_codec_tpu.utils import bitstream_io as bio  # noqa: E402


def read_g192(path: Path) -> list[tuple[bytes, int]]:
    frames = []
    with open(path, "rb") as fh:
        while True:
            payload, bfi = bio.read_g192_frame(fh)
            if payload is None:
                break
            frames.append((payload, bfi))
    return frames


def simulate(main: list, help_bs: list, epf: np.ndarray, offset: int,
             signal: int = 3) -> tuple[list, dict]:
    """Returns ([(payload, bfi)], stats); bfi 0 good / 1 lost /
    3 redundancy frame."""
    pat = np.resize(epf, len(main) + offset)
    out, stat = [], {"main": 0, "help": 0, "nodata": 0}
    for f, (data, bfi) in enumerate(main):
        if not pat[f]:
            out.append((data, bfi))
            stat["main"] += 1
        elif f < len(help_bs) and not pat[f + offset]:
            out.append((help_bs[f][0], 3 if signal == 3 else 0))
            stat["help"] += 1
        else:
            out.append((b"", 1))
            stat["nodata"] += 1
    return out, stat


def write_g192(path: Path, frames: list[tuple[bytes, int]]) -> None:
    with open(path, "wb") as fh:
        for data, bfi in frames:
            bio.write_g192_frame(fh, data, good=(bfi == 0),
                                 redundancy=(bfi == 3))


def main_cli() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("main_bs")
    ap.add_argument("help_bs")
    ap.add_argument("epf")
    ap.add_argument("output")
    ap.add_argument("--offset", type=int, default=1)
    ap.add_argument("--signal", type=int, default=3)
    args = ap.parse_args()
    epf = np.fromfile(args.epf, dtype="<i2") != 0
    out, stat = simulate(read_g192(Path(args.main_bs)),
                         read_g192(Path(args.help_bs)), epf, args.offset,
                         args.signal)
    write_g192(Path(args.output), out)
    src = Path(args.main_bs + ".cfg")
    if src.exists():
        shutil.copy(src, args.output + ".cfg")
    print(f"Stats: main {stat['main']}, help {stat['help']}, "
          f"nodata {stat['nodata']}")
    return 0


if __name__ == "__main__":
    sys.exit(main_cli())
