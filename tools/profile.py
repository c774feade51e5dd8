#!/usr/bin/env python3
"""Per-stage encoder profile — the WMOPS-counter analog (the fixed-point
reference brackets each stage with BASOP_sub_start/end, basic_op/count.c:
31-115; here each stage is timed as an isolated jitted kernel on the
available accelerator).

Two outputs:
  1. a stage table: isolated per-stage time over a [B] stream batch and its
     share of the summed stage time (isolated sums exceed the fused
     whole-pipeline time — XLA fuses aggressively — so the share, not the
     absolute, is the signal);
  2. the fused full-pipeline time (what bench.py measures per frame).

Optionally (--trace DIR) wraps the fused run in jax.profiler.trace so the
named scopes in models/encoder.py (Mdct, Olpa, AriEncoder, ...) can be
inspected in TensorBoard/Perfetto.

The stage list mirrors models/encoder.py:encode_frame stage-for-stage; if a
stage is added there, add it here.
"""
import argparse
import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def _timeit(fn, *args, iters=8):
    import jax
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--streams", type=int, default=1024)
    ap.add_argument("--fs", type=int, default=48000)
    ap.add_argument("--bitrate", type=int, default=64000)
    ap.add_argument("--trace", default=None,
                    help="directory for a jax.profiler trace of the fused run")
    ap.add_argument("--json", action="store_true", help="print JSON only")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from audio_codec_tpu import tables as T
    from audio_codec_tpu.config import Config
    from audio_codec_tpu.models import encoder, state as S
    from audio_codec_tpu.ops import analysis, ari, bits, quant, sns, tns, transforms

    cfg = Config(fs_in=args.fs, bitrate=args.bitrate)
    B = args.streams
    rng = np.random.default_rng(0)
    pcm = jnp.asarray((rng.standard_normal((B, cfg.frame_length)) * 3000.0
                       ).astype(np.float32))
    st = S.enc_state_init(cfg, B)

    # ---- run the real chain once to collect stage inputs -------------------
    x = pcm
    d0, _ = transforms.mdct(cfg, x, st.mdct_mem)
    y12k8, *_ = analysis.resample_12k8(cfg, x, st.r12k8_mem_in,
                                       st.r12k8_mem_50, st.r12k8_mem_out)
    T0, nc, *_ = analysis.olpa(cfg, y12k8, st.olpa_mem_s12k8,
                               st.olpa_mem_s6k4, st.olpa_mem_pitch)
    ener = analysis.per_band_energy(cfg, d0)
    bw_idx = analysis.detect_cutoff_warped(cfg, ener)
    scf = sns.compute_scf(cfg, ener, jnp.zeros((B,), jnp.int32))
    scf_idx, scf_q = sns.quantize_scf_enc(cfg, scf)
    gains = sns.interpolate_scf(cfg, scf_q, encoder_side=True)
    d1 = sns.mdct_shaping(cfg, d0, gains)
    d2, tns_order, tns_idx, num_tns, tns_bits = tns.tns_encode(cfg, d1, bw_idx)
    target = cfg.targetBitsInit - (tns_bits + 4)
    dy = d2[:, : cfg.yLen]
    gain, gg_idx, gg_min, *_ = quant.estimate_global_gain(
        cfg, dy, target, st.targetBitsOff, st.mem_targetBits, st.mem_specBits)
    xq = quant.quantize_spectrum(cfg, dy, gain)
    est = quant.bit_estimate(cfg, xq, target, mode=-1)
    cutoff_name = {100: "BW_cutoff_bin_all", 50: "BW_cutoff_bin_all_5ms",
                   25: "BW_cutoff_bin_all_2_5ms"}[cfg.frame_dms]
    bw_bin = jnp.asarray(T.t(cutoff_name), jnp.int32)[bw_idx]
    res_bits, n_res = quant.residual_encode(cfg, dy, xq, gain, target,
                                            est["nbits2"])
    buf0 = jnp.zeros((B, cfg.targetBytes), jnp.int32)
    buf, bp_side, mask_side = bits.pack_side_info(
        cfg, buf0, bw_idx, est["lastnz2"], est["lsbMode"], gg_idx, num_tns,
        tns_order, jnp.zeros((B, 3), jnp.int32), scf_idx,
        jnp.zeros((B,), jnp.int32))

    stages = [
        ("Mdct", lambda: transforms.mdct(cfg, x, st.mdct_mem)),
        ("Resamp12k8", lambda: analysis.resample_12k8(
            cfg, x, st.r12k8_mem_in, st.r12k8_mem_50, st.r12k8_mem_out)),
        ("Olpa", lambda: analysis.olpa(cfg, y12k8, st.olpa_mem_s12k8,
                                       st.olpa_mem_s6k4, st.olpa_mem_pitch)),
        ("LtpfCoder", lambda: analysis.ltpf_encode(
            cfg, y12k8, T0, nc, st.ltpf_mem_in, st.ltpf_mem_normcorr,
            st.ltpf_mem_mem_normcorr, st.ltpf_mem_ltpf_on,
            st.ltpf_mem_pitch)),
        ("AttackDetector", lambda: analysis.attack_detector(
            cfg, x, st.attdec_position, st.attdec_acc_energy,
            st.attdec_filter_mem)),
        ("PerBandEnergy", lambda: analysis.per_band_energy(cfg, d0)),
        ("DetectCutoffWarped", lambda: analysis.detect_cutoff_warped(cfg, ener)),
        ("SnsComputeScf", lambda: sns.compute_scf(
            cfg, ener, jnp.zeros((B,), jnp.int32))),
        ("SnsQuantizeScf", lambda: sns.quantize_scf_enc(cfg, scf)),
        ("SnsInterpolate+Shaping", lambda: sns.mdct_shaping(
            cfg, d0, sns.interpolate_scf(cfg, scf_q, encoder_side=True))),
        ("TnsCoder", lambda: tns.tns_encode(cfg, d1, bw_idx)),
        ("EstimateGlobalGain", lambda: quant.estimate_global_gain(
            cfg, dy, target, st.targetBitsOff, st.mem_targetBits,
            st.mem_specBits)),
        ("QuantizeSpec+BitEst", lambda: quant.bit_estimate(
            cfg, quant.quantize_spectrum(cfg, dy, gain), target, mode=-1)),
        ("NoiseFactor", lambda: quant.noise_factor(cfg, dy, xq, gain, bw_bin)),
        ("ResidualCoding", lambda: quant.residual_encode(
            cfg, dy, xq, gain, target, est["nbits2"])),
        ("EncoderEntropy", lambda: bits.pack_side_info(
            cfg, buf0, bw_idx, est["lastnz2"], est["lsbMode"], gg_idx,
            num_tns, tns_order, jnp.zeros((B, 3), jnp.int32), scf_idx,
            jnp.zeros((B,), jnp.int32))),
        ("AriEncoder", lambda: ari.encode(
            cfg, buf, bp_side, mask_side, xq, tns_order, tns_idx, num_tns,
            est["lastnz2"], est["lsbMode"], res_bits,
            jnp.where(est["lsbMode"] == 0, n_res, 0))),
    ]

    rows = []
    for name, thunk in stages:
        dt = _timeit(jax.jit(lambda t=thunk: t()))
        rows.append((name, dt))

    full = jax.jit(lambda s, p: encoder.encode_frame(cfg, s, p))
    t_full = _timeit(full, st, pcm)
    if args.trace:
        with jax.profiler.trace(args.trace):
            out = full(st, pcm)
            jax.block_until_ready(out)

    total = sum(dt for _, dt in rows)
    dev = jax.devices()[0].platform
    result = {
        "device": dev, "streams": B, "fs": args.fs, "bitrate": args.bitrate,
        "fused_frame_ms": round(t_full * 1e3, 3),
        "isolated_sum_ms": round(total * 1e3, 3),
        "stages": [{"name": n, "ms": round(dt * 1e3, 3),
                    "share_pct": round(100 * dt / total, 1)}
                   for n, dt in sorted(rows, key=lambda r: -r[1])],
    }
    if args.json:
        print(json.dumps(result))
        return
    print(f"device={dev} B={B} fs={args.fs} bitrate={args.bitrate}")
    print(f"fused encode_frame: {t_full*1e3:8.3f} ms "
          f"({B / t_full / 1e6:.2f} M frames/s)")
    print(f"isolated stage sum: {total*1e3:8.3f} ms "
          f"(fusion gain {total / t_full:.2f}x)\n")
    print(f"{'stage':<24}{'ms':>10}{'share':>8}")
    for s in result["stages"]:
        print(f"{s['name']:<24}{s['ms']:>10.3f}{s['share_pct']:>7.1f}%")


if __name__ == "__main__":
    main()
