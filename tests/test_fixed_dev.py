"""Device (batched jnp, x64) fixed decoder: bit-exact vs the host
MD5-gate decoder on the testvec operating points.

x64 is process-global and would change weak-type promotion for every
other test in this process, so the check runs in a subprocess (same
pattern as test_multihost.py) via tools/fixed_dev_check.py, which decodes
real fixed-oracle bitstreams with both decoders and requires identical
PCM. The host decoder is itself MD5-verified against testvec/md5_dec.txt
(test_testvec_md5.py), so agreement here extends the MD5 gate to the
device path."""
from __future__ import annotations

import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent

pytestmark = pytest.mark.slow


@pytest.mark.parametrize("wav", ["thetest16", "thetest48"])
def test_device_fixed_decoder_bit_exact(wav):
    r = subprocess.run(
        [sys.executable, str(REPO / "tools/fixed_dev_check.py"), "40", wav],
        capture_output=True, text=True, timeout=3000)
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    assert "OK" in r.stdout and "MISMATCH" not in r.stdout, r.stdout


def test_device_fixed_decoder_all_rates():
    """All six 10 ms gate rates, shorter run (compile dominates)."""
    r = subprocess.run(
        [sys.executable, str(REPO / "tools/fixed_dev_check.py"), "25"],
        capture_output=True, text=True, timeout=6000)
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    assert r.stdout.count(" OK") == 6, r.stdout
