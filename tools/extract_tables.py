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


SRC_FX = REPO / ".oracle/src/fixed_point/constants.c"

# fixed-point-only tables (the advanced-PLC chain exists only in the
# fixed-point build, SURVEY.md §2.3); parsed from Word16/Word32 literals
FX_DECL_RE = re.compile(r"const\s+(Word16|Word32)\s+(\w+)\s*\[\s*(\w+)\s*\]\s*=\s*\{")

_FS_TAGS = ["8000", "16000", "24000", "32000", "48000"]
# concrete per-fs pre-emphasis arrays per frame duration (pointer tables
# lpc_lin_pre_emphasis{,_5ms,_2_5ms} in fixed constants.c)
_PREEMPH_MAP = {
    "100": ["80_8000", "80_16000", "80_24000", "80_32000", "80_48000"],
    "50": ["40_8000", "80_16000", "40_24000", "80_32000", "80_48000"],
    "25": ["20_8000", "40_16000", "60_24000", "80_32000", "60_48000"],
}
_BANDS_LIN_MAP = {
    "100": _FS_TAGS,
    "50": ["8000", "8000", "24000", "16000", "24000"],
    "25": ["8000", "8000", "8000", "8000", "16000"],
}


def _fx_arrays(text: str) -> dict[str, np.ndarray]:
    """Parse all 1-D Word16/Word32 arrays from fixed-point constants.c
    into raw signed integer arrays."""
    out: dict[str, np.ndarray] = {}
    for m in FX_DECL_RE.finditer(text):
        ctype, name = m.group(1), m.group(2)
        end = matching_brace(text, m.end() - 1)
        body = re.sub(r"/\*.*?\*/", " ", text[m.end() - 1 : end], flags=re.S)
        body = re.sub(r"\((?:Word16|Word32|UWord16|UWord32)\)", " ", body)
        vals = []
        for tok in re.findall(r"[-+]?(?:0[xX][0-9a-fA-F]+|\d+)", body):
            v = int(tok, 0)
            bits = 16 if ctype == "Word16" else 32
            if v >= 1 << (bits - 1):
                v -= 1 << bits
            vals.append(v)
        out[name] = np.array(vals, np.int64)
    return out


def extract_fixed(tables: dict[str, np.ndarray]) -> None:
    """Advanced-PLC tables (TDC filters, lag windows, linear band offsets,
    band-energy pre-emphasis, scf de-emphasis) from the fixed-point source."""
    fx = _fx_arrays(SRC_FX.read_text())

    def q15(name):
        return (fx[name] / 32768.0).astype(np.float64)

    tables["plc_preemph_fac"] = q15("plc_preemph_fac")
    for n in ("TDC_high_16", "TDC_high_32", "TDC_high_16_harm",
              "TDC_high_32_harm"):
        tables[n] = q15(n)
    tables["plc_lag_win"] = np.stack(
        [fx[f"lag_win_{t}"] / 2 ** 31
         for t in ("8k", "16k", "24k", "32k", "48k")])
    tables["plc_rect_len"] = fx["rectLengthTab"].astype(np.int32)
    for t in _FS_TAGS:
        tables[f"bands_offset_{t}_lpc_lin"] = \
            fx[f"bands_offset_{t}_lpc_lin"].astype(np.int32)
    for dms, names in _PREEMPH_MAP.items():
        for fs_i, tag in enumerate(names):
            m_ = fx[f"lpc_lin_pre_emphasis_{tag}"]
            e_ = fx[f"lpc_lin_pre_emphasis_{tag.replace('_', '_e_', 1)}"]
            tables[f"plc_lin_pre_emph_{dms}_{fs_i}"] = \
                m_ / 32768.0 * np.exp2(e_)
    warp = []
    for t in _FS_TAGS:
        m_ = fx[f"lpc_warp_dee_emphasis_16_{t}"]
        e_ = fx[f"lpc_warp_dee_emphasis_16_e_{t}"]
        warp.append(m_ / 32768.0 * np.exp2(e_))
    tables["plc_warp_dee_emphasis"] = np.stack(warp)


SRC_ROM = REPO / ".oracle/src/fixed_point/rom_basop_util.c"
ROM_DECL_RE = re.compile(
    r"const\s+(Word16|Word32|UWord16|UWord32)\s+(\w+)\s*\[\s*([^\]]+)\s*\]\s*=\s*\{")


def extract_basop(tables: dict[str, np.ndarray]) -> None:
    """BASOP ROM tables needed by the integer-exact decode path
    (ops/fixed_dec.py): exp2 lookup tables (BASOP_Util_InvLog2,
    basop_util.c:88-135 / InvLog2_16:865-875) and the fixed TNS quantizer
    points — stored as raw integers with an fx_ prefix."""
    text = SRC_ROM.read_text() + SRC_FX.read_text()
    want = {"exp2_tab_long", "exp2w_tab_long", "exp2x_tab_long",
            "InvLog2_16_table1", "InvLog2_16_table2", "tnsQuantPts",
            "isqrt_table", "sqrt_table", "InvTable", "InvDiffTable",
            # fixed SNS decoder (sns_quantize_scf_fx.c / pvq_dec_fx.c)
            "st1SCF0_7_base5_32x8_Q14", "st1SCF8_15_base5_32x8_Q14",
            "sns_vq_reg_adj_gains", "sns_vq_reg_lf_adj_gains",
            "sns_vq_near_adj_gains", "sns_vq_far_adj_gains",
            "isqrt_Q16tab", "ISqrtTable", "ISqrtDiffTable", "SqrtTable",
            "SqrtDiffTable",
            # fixed FFT/DCT-IV (fft.c / dct4_fx.c, BASOP_cfft sizes used by
            # the 10 ms IMDCT: 40/80/120/160/240)
            "RotVector_320", "RotVector_480", "RotVector_40_32",
            # fixed MDCT synthesis windows (imdct_fx.c W_fx)
            "LowDelayShapes_n960_N80", "LowDelayShapes_n960_N160",
            "LowDelayShapes_n960_N240", "LowDelayShapes_n960_N320",
            "LowDelayShapes_n960_N480",
            # 2.5 / 5 ms fixed MDCT synthesis windows (setup_dec_lc3.c:206,231)
            "LowDelayShapes_n960_N40_5ms", "LowDelayShapes_n960_N80_5ms",
            "LowDelayShapes_n960_N120_5ms", "LowDelayShapes_n960_N160_5ms",
            "LowDelayShapes_n960_N240_5ms",
            "LowDelayShapes_n960_N40_2_5ms", "LowDelayShapes_n960_N80_2_5ms",
            "LowDelayShapes_n960_N120_2_5ms",
            "LowDelayShapes_n960_N160_2_5ms",
            "LowDelayShapes_n960_N240_2_5ms",
            # fixed LTPF decoder scalars (ltpf_decoder_fx.c)
            "pitch_scale", "inter_filter_len", "inter_filter_shift",
            "tilt_filter_len", "gain_scale_fac", "ltpf_overlap_len",
            # fixed advanced-PLC (plc_*.c)
            "e_tot_headroom", "mdct_grp_bins_fx",
            "xavg_N_grp_fx", "spec_shape_headroom", "hamm_len2Tab",
            "rectLengthTab",
            "lpc_warp_dee_emphasis_16_8000", "lpc_warp_dee_emphasis_16_e_8000",
            "lpc_warp_dee_emphasis_16_16000", "lpc_warp_dee_emphasis_16_e_16000",
            "lpc_warp_dee_emphasis_16_24000", "lpc_warp_dee_emphasis_16_e_24000",
            "lpc_warp_dee_emphasis_16_32000", "lpc_warp_dee_emphasis_16_e_32000",
            "lpc_warp_dee_emphasis_16_48000", "lpc_warp_dee_emphasis_16_e_48000",
            # TD-PLC (plc_tdc_main_fx.c + LPC analysis chain)
            "TDC_high_16", "TDC_high_32", "TDC_high_16_harm",
            "TDC_high_32_harm", "lag_win_8k", "lag_win_16k", "lag_win_24k",
            "lag_win_32k", "lag_win_48k", "plc_preemph_fac",
            "lpc_lin_pre_emphasis_80_8000", "lpc_lin_pre_emphasis_80_e_8000",
            "lpc_lin_pre_emphasis_80_16000", "lpc_lin_pre_emphasis_80_e_16000",
            "lpc_lin_pre_emphasis_80_24000", "lpc_lin_pre_emphasis_80_e_24000",
            "lpc_lin_pre_emphasis_80_32000", "lpc_lin_pre_emphasis_80_e_32000",
            "lpc_lin_pre_emphasis_80_48000", "lpc_lin_pre_emphasis_80_e_48000",
            "inv_odft_twiddle_80_re", "inv_odft_twiddle_80_im",
            "inv_odft_twiddle_40_re", "inv_odft_twiddle_40_im",
            "bands_offset_with_one_max_lin", "bands_offset_with_two_max_lin",
            "bands_offset_with_one_max", "bands_offset_with_two_max",
            "bands_nrg_scale", "InvIntTable", "RealFFT80_twid",
            "RealFFT40_twid",
            # PhECU rfft/cfft sizes (Lprot 128..768) + PhECU tables
            "RotVector_32_8", "RotVector_32_12", "RotVector_32_32",
            "RealFFT128_twid", "RealFFT256_twid", "RealFFT384_twid",
            "RealFFT512_twid", "RealFFT768_twid", "RotVector_360",
            "sin_quarterQ15_fx", "sincos_lowres_tab_sinQ15_fx",
            "xfp_wE_MDCT2FFTQ11", "PhEcu_Xsav_Flt2FxScaleQ15",
            "PhEcu_Xsav_Flt2FxDnShift", "PhEcu_frac_thr_rise_lin_Q15",
            "PhEcu_frac_thr_decay_lin_Q15", "PhEcuFftScale",
            "POW_ATT_TABLE0", "POW_ATT_TABLE1", "POW_ATT_TABLE_p3x1_6",
            "POW_ATT_TABLE_p4x1_6", "POW_ATT_TABLE_p3x2_6",
            "POW_ATT_TABLE_p4x2_6", "POW_ATT_TABLE_p3x4_6",
            "POW_ATT_TABLE_p4x4_6", "POW_ATT_TABLE_p3x8_6",
            "POW_ATT_TABLE_p4x8_6",
            "PhECU_whr16ms_NB_Q15", "PhECU_whr16ms_WB_Q15",
            "PhECU_whr16ms_sWB_Q15", "PhECU_whr16ms_SWB_Q15",
            "PhECU_whr16ms_FB_Q15",
            "PhECU_preTdaFx16ms_NB_Q14", "PhECU_preTdaFx16ms_WB_Q14",
            "PhECU_preTdaFx16ms_sWB_Q14", "PhECU_preTdaFx16ms_SWB_Q14",
            "PhECU_preTdaFx16ms_FB_Q14",
            "PhECU_preTdaFx16ms_128_pre_Q14", "PhECU_preTdaFx16ms_256_pre_Q14",
            "PhECU_preTdaFx16ms_384_pre_Q14", "PhECU_preTdaFx16ms_512_pre_Q14",
            "PhECU_preTdaFx16ms_768_pre_Q14",
            "w_new_fs_8_LA_0", "w_old_fs_8_LA_0", "w_new_fs_16_LA_0",
            "w_old_fs_16_LA_0", "w_new_fs_24_LA_0", "w_old_fs_24_LA_0",
            "w_new_fs_32_LA_0", "w_old_fs_32_LA_0", "w_new_fs_48_LA_0",
            "w_old_fs_48_LA_0"}
    for m in ROM_DECL_RE.finditer(text):
        ctype, name = m.group(1), m.group(2)
        if name not in want:
            continue
        end = matching_brace(text, m.end() - 1)
        body = re.sub(r"/\*.*?\*/", " ", text[m.end() - 1: end], flags=re.S)
        body = re.sub(r"\((?:U?Word16|U?Word32)\)", " ", body)
        vals = []
        for tok in re.findall(r"[-+]?(?:0[xX][0-9a-fA-F]+|\d+)", body):
            v = int(tok, 0)
            bits = 16 if "16" in ctype else 32
            if not ctype.startswith("U") and v >= 1 << (bits - 1):
                v -= 1 << bits
            vals.append(v)
        tables["fx_" + name] = np.array(vals, np.int64)


FX3_WANT = {"inter_filter": (5, 4, 12), "tilt_filter": (5, 4, 11)}
FX3_RE = re.compile(r"const\s+Word16\s+(\w+)\s*\[(\d+)\]\s*\[(\d+)\]\s*\[(\d+)\]\s*=\s*\{")


def extract_fx3(tables: dict[str, np.ndarray]) -> None:
    """3-D Word16 tables (LTPF interpolation/tilt filters,
    fixed constants.c:2481-2514)."""
    text = SRC_FX.read_text()
    for m in FX3_RE.finditer(text):
        name = m.group(1)
        if name not in FX3_WANT:
            continue
        dims = tuple(int(m.group(k)) for k in (2, 3, 4))
        assert dims == FX3_WANT[name], (name, dims)
        end = matching_brace(text, m.end() - 1)
        body = re.sub(r"/\*.*?\*/", " ", text[m.end() - 1: end], flags=re.S)
        # C zero-pads short row initializers: walk innermost {...} groups
        rows = []
        depth, cur = 0, None
        for ch_i, ch in enumerate(body):
            if ch == "{":
                depth += 1
                if depth == 3:
                    cur = ch_i + 1
            elif ch == "}":
                if depth == 3:
                    rows.append(body[cur:ch_i])
                depth -= 1
        arr = np.zeros(dims, np.int64)
        assert len(rows) == dims[0] * dims[1], (name, len(rows))
        for r_i, row in enumerate(rows):
            vals = [int(tok, 0) for tok in
                    re.findall(r"[-+]?(?:0[xX][0-9a-fA-F]+|\d+)", row)]
            vals = [v - 0x10000 if v >= 0x8000 else v for v in vals]
            arr[r_i // dims[1], r_i % dims[1], :len(vals)] = vals
        tables["fx_" + name] = arr


PW_DECL_RE = re.compile(r"const\s+PWord16\s+(\w+)\s*\[[^\]]*\]\s*=\s*\{")
PW_WANT = {"SineTable320", "SineTable480", "SineWindow20", "SineWindow40",
           "SineWindow60", "SineWindow80", "SineWindow120", "SineWindow160",
           "SineWindow240", "SineWindow320", "SineWindow480"}


def _word32_to_16(v: int) -> int:
    """WORD322WORD16 (basop_util.h:40-44): Word32 -> Word16 round w/ sat."""
    if v >= 1 << 31:
        v -= 1 << 32
    r = (v >> 15) + 1
    if r > 0xFFFF and v > 0:
        return 32767
    r >>= 1
    r &= 0xFFFF
    return r - 0x10000 if r >= 0x8000 else r


def extract_pword16(tables: dict[str, np.ndarray]) -> None:
    """PWord16 twiddle tables (rom_basop_util.c STCP initializers): stored
    as [N, 2] int16 (re, im) after the WORD322WORD16 conversion the C
    compiler applies to the Word32 literals."""
    text = SRC_ROM.read_text()
    for m in PW_DECL_RE.finditer(text):
        name = m.group(1)
        if name not in PW_WANT:
            continue
        end = matching_brace(text, m.end() - 1)
        body = re.sub(r"/\*.*?\*/", " ", text[m.end() - 1: end], flags=re.S)
        vals = [_word32_to_16(int(tok, 16))
                for tok in re.findall(r"0[xX][0-9a-fA-F]+", body)]
        assert len(vals) % 2 == 0, name
        tables["fx_" + name] = np.array(vals, np.int64).reshape(-1, 2)


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
    extract_fixed(tables)
    extract_basop(tables)
    extract_pword16(tables)
    extract_fx3(tables)
    src_hash = hashlib.sha256(text.encode() + SRC_FX.read_bytes()
                              + SRC_ROM.read_bytes()).hexdigest()
    tables["__source_sha256__"] = np.frombuffer(bytes.fromhex(src_hash), dtype=np.uint8)
    OUT.parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(OUT, **tables)
    print(f"wrote {OUT} : {len(tables)-1} tables, source sha256 {src_hash[:16]}…")


if __name__ == "__main__":
    main()
