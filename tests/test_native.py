"""Native host runtime (C++ via ctypes) vs NumPy fallback equivalence."""
import importlib
import subprocess
from pathlib import Path

import numpy as np

from audio_codec_tpu.utils import native

if not native.have_native():
    # fresh checkout: build the shared library on demand so the fast gate
    # is green out of the box (g++ is part of the baked-in toolchain)
    subprocess.run(
        ["bash", str(Path(__file__).resolve().parent.parent / "tools/build_native.sh")],
        check=True, capture_output=True)
    importlib.reload(native)


def test_native_available():
    assert native.have_native(), "tools/build_native.sh did not produce the library"


def test_pcm_roundtrip():
    rng = np.random.default_rng(0)
    x = (rng.standard_normal((3, 1000)) * 8000).astype(np.float32)
    inter = native.pcm16_interleave(x)
    assert inter.shape == (1000, 3)
    deint = native.pcm16_deinterleave(inter, 3)
    v = np.sign(x) * np.floor(np.abs(x) + 0.5)
    assert np.array_equal(deint, np.clip(v, -32768, 32767).astype(np.float32))


def test_bitstream_framing():
    rng = np.random.default_rng(1)
    payloads = rng.integers(0, 256, (50, 80), dtype=np.uint8)
    body = native.bs_emit_frames(payloads)
    offsets, lengths = native.bs_scan_frames(body)
    assert len(offsets) == 50 and (lengths == 80).all()
    back = native.bs_gather_frames(body, offsets, 80)
    assert np.array_equal(back, payloads)


def test_truncated_detected():
    payloads = np.zeros((2, 10), np.uint8)
    body = native.bs_emit_frames(payloads)[:-3]
    try:
        native.bs_scan_frames(body)
        assert False, "should raise"
    except ValueError:
        pass
