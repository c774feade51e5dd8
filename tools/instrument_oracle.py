#!/usr/bin/env python3
"""Inject per-stage dump hooks into the oracle build (.oracle/) and rebuild.

Inserts lc3_dump_* calls at every stage boundary of the ETSI float encoder
(enc_lc3_fl.c) and decoder (dec_lc3_fl.c) so the test suite can compare each
JAX stage against golden intermediates. The dumps are runtime-gated on the
LC3_DUMP_DIR environment variable, so the instrumented binary is still
bit-identical to the stock oracle in normal operation.

Idempotent: skips files already instrumented. Run after tools/build_oracle.sh.
"""
import shutil
import subprocess
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
FL = REPO / ".oracle/src/floating_point"
FX = REPO / ".oracle/src/fixed_point"

ENC_INSERTS = [
    # (anchor, code inserted BEFORE anchor)
    ("    /* 12.8 kHz resampler */",
     'lc3_dump_f32("enc_in", h_EncSetup->s_in_scaled, encoder->frame_length);\n'
     'lc3_dump_f32("enc_mdct", d_fl, encoder->frame_length);\n'),
    ("\t/* Pitch estimation */",
     'lc3_dump_f32("enc_s12k8", h_EncSetup->s_12k8, s_12k8_len + 1);\n'),
    ("\t/* LTPF encoder */",
     'lc3_dump_i32("enc_olpa_T0", &T0_out, 1);\n'
     'lc3_dump_f32("enc_olpa_nc", &normcorr, 1);\n'),
    ("    /* Attack detector */",
     'lc3_dump_i32("enc_ltpf_param", h_EncSetup->ltpf_param, 3);\n'
     'lc3_dump_i32("enc_ltpf_bits", &ltpfBits, 1);\n'),
    ("    /* Per-band energy */",
     'lc3_dump_i32("enc_attdec", &h_EncSetup->attdec_detected, 1);\n'),
    ("    /* Bandwidth cut-off detection */",
     'lc3_dump_f32("enc_ener", h_EncSetup->ener, encoder->bands_number);\n'),
    ("    processSnsComputeScf_fl(",
     'lc3_dump_i32("enc_bwidx", &BW_cutoff_idx, 1);\n'),
    ("    /* SNS Quantizer */",
     'lc3_dump_f32("enc_scf", h_EncSetup->scf, 16);\n'),
    ("    /* SNS Interpolation */",
     'lc3_dump_f32("enc_scfq", h_EncSetup->scf_q, 16);\n'
     'lc3_dump_i32("enc_scfidx", h_EncSetup->L_scf_idx, 7);\n'),
    ("    /* Bandwidth controller */",
     'lc3_dump_f32("enc_shaped", d_fl, encoder->frame_length);\n'
     'lc3_dump_f32("enc_intscf", h_EncSetup->int_scf, encoder->bands_number);\n'),
    ("    /* Global Gain Estimation */",
     'lc3_dump_f32("enc_tns_out", d_fl, encoder->frame_length);\n'
     'lc3_dump_i32("enc_tns_order", tns_order, 2);\n'
     'lc3_dump_i32("enc_tns_idx", indexes, 16);\n'
     'lc3_dump_i32("enc_tns_nf", &tns_numfilters, 1);\n'
     'lc3_dump_i32("enc_tns_bits", &h_EncSetup->tns_bits, 1);\n'),
    ("    /* 1. Quantization */",
     'lc3_dump_f32("enc_gain", &gain, 1);\n'
     'lc3_dump_i32("enc_gg", &quantizedGain, 1);\n'
     'lc3_dump_i32("enc_ggmin", &quantizedGainMin, 1);\n'
     'lc3_dump_f32("enc_targetBitsOff", &h_EncSetup->targetBitsOff, 1);\n'
     'lc3_dump_i32("enc_targetBitsQuant", &h_EncSetup->targetBitsQuant, 1);\n'),
    ("    /* Global Gain Adjustment */",
     'lc3_dump_i32("enc_nbits", &nbits, 1);\n'
     'lc3_dump_i32("enc_nbits2", &nbits2, 1);\n'),
    ("    /* Noise factor */",
     'lc3_dump_i32("enc_qd", q_d, encoder->yLen);\n'
     'lc3_dump_i32("enc_lastnz", &lastnz, 1);\n'
     'lc3_dump_i32("enc_lsbMode", &lsbMode, 1);\n'
     'lc3_dump_i32("enc_gg2", &quantizedGain, 1);\n'
     'lc3_dump_f32("enc_gain2", &gain, 1);\n'
     'lc3_dump_i32("enc_gainChange", &gainChange, 1);\n'),
    ("    /* Residual Coding */",
     'lc3_dump_i32("enc_facns", &fac_ns_idx, 1);\n'),
    ("    /* Entropy encoding */",
     'lc3_dump_i32("enc_numResBits", &numResBits, 1);\n'
     'lc3_dump_u8("enc_resBits", h_EncSetup->resBits, 80);\n'),
    ("    /* Artithmetic encoding */",
     'lc3_dump_u8("enc_side_bytes", bytes, h_EncSetup->targetBytes);\n'
     'lc3_dump_i32("enc_bp_side", &bp_side, 1);\n'
     'lc3_dump_i32("enc_mask_side", &mask_side, 1);\n'),
]
ENC_APPEND_AFTER = (
    "                         h_EncSetup->codingdata, h_EncSetup->resBits, numResBits, lsbMode, h_EncSetup->targetBitsAri,\n"
    "                         h_EncSetup->enable_lpc_weighting);",
    '\nlc3_dump_u8("enc_bytes", bytes, h_EncSetup->targetBytes);\n',
)

DEC_INSERTS = [
    ("    /* Arithmetic decoding */",
     'if (bfi != 1) {\n'
     'lc3_dump_i32("dec_gg", &gg_idx, 1);\n'
     'lc3_dump_i32("dec_scfidx", h_DecSetup->scf_idx, 7);\n'
     'lc3_dump_i32("dec_facns", &fac_ns_idx, 1);\n'
     'lc3_dump_i32("dec_tnsnf", &tns_numfilters, 1);\n'
     'lc3_dump_i32("dec_ltpf", h_DecSetup->ltpf_param, 3);\n'
     'lc3_dump_i32("dec_bw", &bw_cutoff_idx, 1);\n'
     'lc3_dump_i32("dec_lastnz", &lastnz, 1);\n'
     'lc3_dump_i32("dec_lsb", &lsbMode, 1);\n'
     '}\n'),
    ("        /* SNS Quantize Decoder */",
     'lc3_dump_f32("dec_spec_ari", h_DecSetup->sqQdec_fl, decoder->yLen);\n'
     'lc3_dump_i32("dec_nfseed", &nf_seed, 1);\n'
     'lc3_dump_i32("dec_zf", &zero_frame, 1);\n'
     'lc3_dump_i32("dec_nbres", &nbits_residual, 1);\n'
     'lc3_dump_i32("dec_respresent", &residualPresent, 1);\n'
     'lc3_dump_i32("dec_tnsorder", tns_order, 2);\n'
     'lc3_dump_i32("dec_tnsidx", h_DecSetup->tns_idx, 16);\n'),
    ("        /* Noise filling */",
     'lc3_dump_f32("dec_spec_res", h_DecSetup->sqQdec_fl, decoder->yLen);\n'),
    ("        /* Application of global gain */",
     'lc3_dump_f32("dec_spec_nf", h_DecSetup->sqQdec_fl, decoder->yLen);\n'),
    ("        /* TNS decoder */",
     'lc3_dump_f32("dec_spec_gg", h_DecSetup->sqQdec_fl, decoder->yLen);\n'),
    ("        /* SNS interpolation */",
     'lc3_dump_f32("dec_spec_tns", h_DecSetup->sqQdec_fl, decoder->yLen);\n'),
    ("    /* PLC */",
     'lc3_dump_f32("dec_spec_shaped", h_DecSetup->sqQdec_fl, decoder->yLen);\n'
     'lc3_dump_f32("dec_scfq", h_DecSetup->scf_q, 16);\n'),
    ("    processPlcUpdate_fl(",
     'lc3_dump_f32("dec_imdct", h_DecSetup->x_fl, decoder->frame_length);\n'),
    ("        /* Round, scale and copy output to output buffer */",
     'lc3_dump_f32("dec_ltpf_out", h_DecSetup->x_fl, decoder->frame_length);\n'),
]


# fixed-point decoder (dec_lc3.c): Word32 spectrum q_d_fx + exponent
# q_fx_exp after every stage — the golden source for the bit-exact decode
# path (ops/fixed_dec.py); all dumps gate on clean frames (bfi == 0)
FX_DEC_INSERTS = [
    ('    BASOP_sub_start("SnsQuantScfDec");',
     'if (bfi == 0) {\n'
     'lc3_dump_i16("fxd_zf", &zero_frame, 1);\n'
     'lc3_dump_i32("fxd_scfidx", (int32_t*)L_scf_idx, 7);\n'
     'lc3_dump_i16("fxd_ltpfidx", ltpf_idx, 3);\n'
     'lc3_dump_i16("fxd_sqQdec", sqQdec, decoder->yLen);\n'
     'lc3_dump_i32("fxd_spec_ari", q_d_fx, decoder->yLen);\n'
     'lc3_dump_i16("fxd_exp_ari", &q_fx_exp, 1);\n'
     'lc3_dump_i16("fxd_nfseed", &nf_seed, 1);\n'
     'lc3_dump_u8("fxd_resbits", resBitBuf, 640);\n'
     'lc3_dump_i16("fxd_fillbits", &fill_bits, 1);\n'
     'lc3_dump_i16("fxd_gg", &gg_idx, 1);\n'
     'lc3_dump_i16("fxd_facns", &fac_ns_idx, 1);\n'
     'lc3_dump_i16("fxd_bw", &BW_cutoff_idx, 1);\n'
     'lc3_dump_i16("fxd_tnsorder", tns_order, 2);\n'
     'lc3_dump_i16("fxd_tnsidx", indexes, 16);\n'
     '}\n'),
    ('        BASOP_sub_start("Noisefill");',
     'if (bfi == 0) lc3_dump_i32("fxd_spec_res", q_d_fx, decoder->yLen);\n'),
    ('        BASOP_sub_start("applyGlobalGain");',
     'if (bfi == 0) lc3_dump_i32("fxd_spec_nf", q_d_fx, decoder->yLen);\n'),
    ('        BASOP_sub_start("Tns_dec");',
     'if (bfi == 0) {\n'
     'lc3_dump_i32("fxd_spec_gg", q_d_fx, decoder->yLen);\n'
     'lc3_dump_i16("fxd_exp_gg", &q_fx_exp, 1);\n'
     '}\n'),
    ('        BASOP_sub_start("SnsInterpScfDec");',
     'if (bfi == 0) {\n'
     'lc3_dump_i32("fxd_spec_tns", q_d_fx, decoder->yLen);\n'
     'lc3_dump_i16("fxd_exp_tns", &q_fx_exp, 1);\n'
     '}\n'),
    ('        BASOP_sub_start("Mdct shaping_dec");',
     'if (bfi == 0) {\n'
     'lc3_dump_i16("fxd_scfq", scf_q, 16);\n'
     'lc3_dump_i16("fxd_intscf", int_scf_fx, decoder->bands_number);\n'
     'lc3_dump_i16("fxd_intscf_exp", int_scf_fx_exp, decoder->bands_number);\n'
     '}\n'),
    ('    BASOP_sub_start("PLC::Main");',
     'lc3_dump_i16("dbg_xh_premain", h_DecSetup->plcAd->x_old_tot_fx, 96);\n'
     'if (bfi == 0) {\n'
     'lc3_dump_i32("fxd_spec_shaped", q_d_fx, decoder->yLen);\n'
     'lc3_dump_i16("fxd_exp_shaped", &q_fx_exp, 1);\n'
     '}\n'),
    ('    BASOP_sub_start("PLC/PC::DampingScrambling");',
     'lc3_dump_i16("dbg_xh_postmain", h_DecSetup->plcAd->x_old_tot_fx, 96);\n'
     'lc3_dump_i16("fxd_bfi", &bfi, 1);\n'
     'lc3_dump_i16("fxd_cm", &h_DecSetup->concealMethod, 1);\n'
     'lc3_dump_i16("fxd_ncorr", &h_DecSetup->plcAd->norm_corrQ15_fx, 1);\n'
     'lc3_dump_i16("fxd_stab", &h_DecSetup->plcAd->stab_fac, 1);\n'
     'lc3_dump_i16("fxd_nblost", &h_DecSetup->nbLostFramesInRow, 1);\n'),
    ('    BASOP_sub_start("Imdct");',
     'lc3_dump_i32("fxd_spec_pd", q_d_fx, decoder->yLen);\n'
     'lc3_dump_i16("fxd_exp_pd", &q_fx_exp, 1);\n'
     'lc3_dump_i16("fxd_damp", &h_DecSetup->plc_damping, 1);\n'
     'lc3_dump_i16("fxd_cumslow", &h_DecSetup->plcAd->cum_fading_slow, 1);\n'
     'lc3_dump_i16("fxd_cumfast", &h_DecSetup->plcAd->cum_fading_fast, 1);\n'
     'lc3_dump_i16("fxd_cumfflc", &h_DecSetup->plcAd->cum_fflcAtten, 1);\n'
     'lc3_dump_i16("fxd_nsseed", &h_DecSetup->ns_seed, 1);\n'
     'lc3_dump_i16("fxd_tdcseed", &h_DecSetup->plcAd->tdc_seed, 1);\n'
     'lc3_dump_i16("fxd_tdcfract", &h_DecSetup->plcAd->tdc_fract, 1);\n'
     'lc3_dump_i16("fxd_harmQ", &h_DecSetup->plcAd->harmonicBuf_Q, 1);\n'
     'lc3_dump_i32("fxd_tdcgainc", &h_DecSetup->plcAd->tdc_gain_c, 1);\n'
     'lc3_dump_i16("fxd_tdcA", h_DecSetup->plcAd->tdc_A, 17);\n'),
    ('    BASOP_sub_start("PLC::Update");',
     'lc3_dump_i16("fxd_xold_pre", h_DecSetup->plcAd->x_old_tot_fx, h_DecSetup->plcAd->max_len_pcm_plc);\n'
     'lc3_dump_i16("fxd_x_all", x_fx, decoder->frame_length);\n'
     'lc3_dump_i16("fxd_exp_xall", &q_fx_exp, 1);\n'
     'lc3_dump_i16("fxd_ola", h_DecSetup->stDec_ola_mem_fx, decoder->stDec_ola_mem_fx_len);\n'
     'lc3_dump_i16("fxd_ola_exp", &h_DecSetup->stDec_ola_mem_fx_exp, 1);\n'),
    ('    BASOP_sub_start("LtpfDec");',
     'lc3_dump_i16("fxd_xold", h_DecSetup->plcAd->x_old_tot_fx, h_DecSetup->plcAd->max_len_pcm_plc);\n'
     'lc3_dump_i16("fxd_qfold", &h_DecSetup->plcAd->q_fx_old_exp, 1);\n'
     'lc3_dump_i16("fxd_oldscf", h_DecSetup->plcAd->old_scf_q, 16);\n'
     'lc3_dump_i16("fxd_nscum", &h_DecSetup->ns_cum_alpha, 1);\n'
     'lc3_dump_i16("fxd_qold", h_DecSetup->q_old_d_fx, decoder->yLen);\n'
     'lc3_dump_i16("fxd_qold_exp", &h_DecSetup->q_old_fx_exp, 1);\n'
     'lc3_dump_i16("fxd_margin_xfp", &h_DecSetup->plcAd->PhECU_margin_xfp, 1);\n'),
    ('    BASOP_sub_start("PLC::Update");',
     'if (bfi == 0) {\n'
     'lc3_dump_i16("fxd_imdct", x_fx, decoder->frame_length);\n'
     'lc3_dump_i16("fxd_exp_imdct", &q_fx_exp, 1);\n'
     '}\n'),
    ('    BASOP_sub_start("Output scaling");',
     'if (bfi == 0) {\n'
     'lc3_dump_i16("fxd_ltpf", x_fx, decoder->frame_length);\n'
     'lc3_dump_i16("fxd_exp_ltpf", &q_fx_exp, 1);\n'
     '}\n'),
]


# PhECU internals (plc_apply_fx.c case 2), for ops/plc_phecu_fixed.py
FX_PLC_APPLY_INSERTS = [
    ('            y_e = 18;  move16();',
     'lc3_dump_i32("ph_Lecu", L_ecu_rec, frame_length);\n'
     'lc3_dump_i16("ph_XsavQ", &plcAd->PhECU_X_savQ_fx, 1);\n'
     'lc3_dump_i16("ph_nplocs", &plcAd->PhECU_num_plocs, 1);\n'
     'lc3_dump_i16("ph_plocs", plcAd->PhECU_plocs, 20);\n'
     'lc3_dump_i32("ph_f0est", plcAd->PhECU_f0est, 20);\n'
     'lc3_dump_i16("ph_toffs", &plcAd->PhECU_time_offs, 1);\n'
     'lc3_dump_i16("ph_f0bin", &plcAd->PhECU_f0hzLtpBinQ7, 1);\n'
     'lc3_dump_i16("ph_magchg1", plcAd->PhECU_mag_chg_1st, 9);\n'
     'lc3_dump_i16("ph_Xavg", plcAd->PhECU_Xavg, 9);\n'
     'lc3_dump_i16("ph_betamute", &plcAd->PhECU_beta_mute, 1);\n'
     'lc3_dump_i16("ph_Xsav", plcAd->PhECU_X_sav_fx, LprotSzPtr[fs_idx]);\n'
     'lc3_dump_i32("ph_LoldE", &plcAd->PhECU_L_old_xfp_w_E_fx, 1);\n'
     'lc3_dump_i32("ph_LooldE", &plcAd->PhECU_L_oold_xfp_w_E_fx, 1);\n'
     'lc3_dump_i16("ph_oldEexp", &plcAd->PhECU_old_xfp_w_E_exp_fx, 1);\n'
     'lc3_dump_i16("ph_ooldEexp", &plcAd->PhECU_oold_xfp_w_E_exp_fx, 1);\n'
     'lc3_dump_i16("ph_oldLtot", &plcAd->PhECU_old_Ltot_exp_fx, 1);\n'
     'lc3_dump_i16("ph_ooldLtot", &plcAd->PhECU_oold_Ltot_exp_fx, 1);\n'
     'lc3_dump_i16("ph_magchg", dbg_mag_chg_gr, 9);\n'
     'lc3_dump_i16("ph_seedout", &dbg_seed_out, 1);\n'
     'lc3_dump_i16("ph_Xout", dbg_X_out, LprotSzPtr[fs_idx]);\n'),
]


def instrument(path: Path, inserts, append_after=None) -> None:
    text = path.read_text()
    if "lc3_dump.h" in text:
        print(f"{path.name}: already instrumented")
        return
    text = text.replace('#include "functions.h"', '#include "functions.h"\n#include "lc3_dump.h"', 1)
    for anchor, code in inserts:
        assert anchor in text, f"{path.name}: anchor not found: {anchor!r}"
        text = text.replace(anchor, code + anchor, 1)
    if append_after:
        anchor, code = append_after
        assert anchor in text, f"{path.name}: tail anchor not found"
        text = text.replace(anchor, anchor + code, 1)
    path.write_text(text)
    print(f"{path.name}: instrumented")


def main() -> None:
    for fn in ("lc3_dump.c", "lc3_dump.h"):
        shutil.copy(REPO / "tools/oracle_dump" / fn, FL / fn)
        shutil.copy(REPO / "tools/oracle_dump" / fn, FX / fn)
    instrument(FL / "enc_lc3_fl.c", ENC_INSERTS, ENC_APPEND_AFTER)
    instrument(FL / "dec_lc3_fl.c", DEC_INSERTS)
    instrument(FX / "dec_lc3.c", FX_DEC_INSERTS)
    shutil.copy(REPO / "tools/oracle_dump/lc3_dump.h", FX / "lc3_dump.h")
    pa = FX / "plc_apply_fx.c"
    txt = pa.read_text()
    if "dbg_mag_chg_gr" not in txt:
        txt = txt.replace(
            "    band_offsets = NULL;",
            "    band_offsets = NULL;\n"
            "    { static Word16 dbg_pad; dbg_pad = 0; (void)dbg_pad; }")
        txt = txt.replace(
            "NULL,                      /*  o: dbg per band magnitude modifier, incl. burst attenuation   */",
            "dbg_mag_chg_gr,")
        txt = txt.replace(
            "NULL ,                      /* o  :  seed synch dbg"
            "                          */",
            "&dbg_seed_out, /* dbg */")
        txt = txt.replace(
            "NULL ,                      /* o  :  evolved Spectrum   dbg"
            "                  */",
            "dbg_X_out, /* dbg */")
        for needle in ("dbg_mag_chg_gr,", "&dbg_seed_out,", "dbg_X_out,"):
            assert needle in txt, f"instrumentation failed to land: {needle}"
        txt = txt.replace(
            '#include "functions.h"',
            '#include "functions.h"\n'
            'static Word16 dbg_mag_chg_gr[MAX_LGW];\n'
            'static Word16 dbg_seed_out;\n'
            'static Word16 dbg_X_out[MAX_LPROT];\n', 1)
        pa.write_text(txt)
    instrument(FX / "plc_apply_fx.c", FX_PLC_APPLY_INSERTS)
    subprocess.run(["make", "-C", str(FL), "-j8", "OPTIM=2"], check=True,
                   capture_output=True)
    subprocess.run(["make", "-C", str(FX), "-j8", "OPTIM=2"], check=True,
                   capture_output=True)
    print("oracle (instrumented) rebuilt")


if __name__ == "__main__":
    main()
