#!/usr/bin/env python3
"""Extract the normative LC3plus constant tables into audio_codec_tpu/data/tables.npz.

The LC3plus spec (ETSI TS 103 634) defines a large set of numeric constants:
MDCT windows, band offsets, arithmetic-coder context/frequency tables, SNS
codebooks, TNS quantizers, LTPF filters, resampler filters, etc.  These are
*data*, not code — the framework consumes them from a generated .npz.

This tool parses the literal array initializers out of the ETSI reference
sources (floating_point/constants.c, see SURVEY.md §2.4) and records a
provenance hash so the npz can always be re-derived and verified against the
oracle.  Run via: python tools/extract_tables.py
"""
import hashlib
import re
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
SRC = REPO / ".oracle/src/floating_point/constants.c"
OUT = REPO / "audio_codec_tpu/data/tables.npz"

# const <TYPE> name[d0][d1] = { ... };   (TYPE in LC3_INT / LC3_FLOAT / double)
DECL_RE = re.compile(
    r"const\s+(LC3_INT|LC3_FLOAT|double)\s+(\w+)((?:\s*\[\s*\w+\s*\])+)\s*=\s*\{",
)

DIM_DEFINES = {
    "MAX_BW_BANDS_NUMBER": 6,
}


def parse_dims(dimstr: str) -> list[int]:
    dims = []
    for d in re.findall(r"\[\s*(\w+)\s*\]", dimstr):
        dims.append(int(d) if d.isdigit() else DIM_DEFINES[d])
    return dims


def matching_brace(text: str, start: int) -> int:
    """Index just past the brace that closes text[start] (which must be '{')."""
    depth = 0
    for i in range(start, len(text)):
        if text[i] == "{":
            depth += 1
        elif text[i] == "}":
            depth -= 1
            if depth == 0:
                return i + 1
    raise ValueError("unbalanced braces")


NUM_RE = re.compile(r"[-+]?(?:0[xX][0-9a-fA-F]+|\d+\.\d*(?:[eE][-+]?\d+)?|\.\d+(?:[eE][-+]?\d+)?|\d+(?:[eE][-+]?\d+)?)[fF]?")


def parse_numbers(body: str) -> list[float]:
    body = re.sub(r"/\*.*?\*/", " ", body, flags=re.S)
    out = []
    for m in NUM_RE.finditer(body):
        tok = m.group(0)
        if tok.lower().lstrip("+-").startswith("0x"):
            out.append(float(int(tok, 16)))
        else:
            out.append(float(tok.rstrip("fF")))
    return out


def main() -> None:
    text = SRC.read_text()
    tables: dict[str, np.ndarray] = {}
    for m in DECL_RE.finditer(text):
        ctype, name, dimstr = m.group(1), m.group(2), m.group(3)
        dims = parse_dims(dimstr)
        end = matching_brace(text, m.end() - 1)
        vals = parse_numbers(text[m.end() - 1 : end])
        n_expected = int(np.prod(dims))
        if len(vals) != n_expected:
            print(f"  !! {name}: parsed {len(vals)} values, expected {n_expected}", file=sys.stderr)
            raise SystemExit(1)
        dtype = np.int32 if ctype == "LC3_INT" else np.float64
        arr = np.array(vals, dtype=np.float64).reshape(dims)
        tables[name] = arr.astype(dtype)
    src_hash = hashlib.sha256(text.encode()).hexdigest()
    tables["__source_sha256__"] = np.frombuffer(bytes.fromhex(src_hash), dtype=np.uint8)
    OUT.parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(OUT, **tables)
    print(f"wrote {OUT} : {len(tables)-1} tables, source sha256 {src_hash[:16]}…")


if __name__ == "__main__":
    main()
