"""Bit-exact fixed-point decoder stages vs the instrumented ETSI oracle.

The testvec MD5 gate hashes fixed-point decoder output (testvec/
testvecCheck.pl, md5_dec.txt), so the integer decode path (ops/fixed_dec.py)
must reproduce the fixed-point arithmetic exactly. Each stage here is fed
the oracle's own dumped stage inputs and must match the dumped stage output
on EVERY frame of a full testvec decode (tools/instrument_oracle.py hooks
in .oracle/src/fixed_point/dec_lc3.c).
"""
import numpy as np
import pytest

from tests import oracle
from audio_codec_tpu.config import Config
from audio_codec_tpu.ops import fixed_dec as fd

pytestmark = pytest.mark.slow

# testvec operating points (testvec/Readme.txt:25-36), 16-bit / 10 ms
POINTS = [("thetest8", 8000, 32000), ("thetest16", 16000, 32000),
          ("thetest24", 24000, 48000), ("thetest32", 32000, 48000),
          ("thetest44", 44100, 64000), ("thetest48", 48000, 64000)]


@pytest.fixture(scope="module", params=POINTS, ids=[p[0] for p in POINTS])
def point(request):
    wav, fs, br = request.param
    cfg = Config(fs_in=fs, bitrate=br)
    bs = oracle.fx_encode(wav, br)
    dumps, _ = oracle.fx_dec_dumps(bs, f"{wav}_{br}")
    return cfg, dumps


def _sides(dumps, n, yLen):
    return dict(
        sq=oracle.frames(dumps, "fxd_sqQdec", yLen),
        spec_ari=oracle.frames(dumps, "fxd_spec_ari", yLen),
        spec_res=oracle.frames(dumps, "fxd_spec_res", yLen),
        spec_nf=oracle.frames(dumps, "fxd_spec_nf", yLen),
        spec_gg=oracle.frames(dumps, "fxd_spec_gg", yLen),
        spec_tns=oracle.frames(dumps, "fxd_spec_tns", yLen),
        spec_shaped=oracle.frames(dumps, "fxd_spec_shaped", yLen),
        exp_ari=dumps["fxd_exp_ari"], exp_gg=dumps["fxd_exp_gg"],
        exp_tns=dumps["fxd_exp_tns"], exp_shaped=dumps["fxd_exp_shaped"],
        resbits=oracle.frames(dumps, "fxd_resbits", 640),
        fillbits=dumps["fxd_fillbits"], gg=dumps["fxd_gg"],
        facns=dumps["fxd_facns"], bw=dumps["fxd_bw"],
        nfseed=dumps["fxd_nfseed"], zf=dumps["fxd_zf"],
        tnsorder=oracle.frames(dumps, "fxd_tnsorder", 2),
        tnsidx=oracle.frames(dumps, "fxd_tnsidx", 16),
        scfq=oracle.frames(dumps, "fxd_scfq", 16),
        scfidx=oracle.frames(dumps, "fxd_scfidx", 7),
    )


def test_sns_decode(point):
    """Stage-1 + MPVQ stage-2 SNS scale-factor decode, Word16-exact
    (processSnsQuantizeScfDecoder_fx)."""
    cfg, dumps = point
    idx = oracle.frames(dumps, "fxd_scfidx", 7)
    gold = oracle.frames(dumps, "fxd_scfq", 16)
    for f in range(len(idx)):
        scf, ber = fd.sns_decode_scf(idx[f])
        assert ber == 0
        assert np.array_equal(scf, gold[f]), f"scf frame {f}"


def test_imdct(point):
    """Fixed IMDCT: shaped spectrum + exponent -> Word16 time signal,
    bit-exact incl. per-frame exponents and OLA memory carry
    (ProcessingIMDCT, imdct_fx.c:15-180; dct4_fx.c; BASOP_cfft)."""
    from audio_codec_tpu.ops import fixed_imdct as fi
    cfg, dumps = point
    N = cfg.frame_length
    yLen = cfg.yLen
    spec = oracle.frames(dumps, "fxd_spec_shaped", yLen)
    exps = dumps["fxd_exp_shaped"]
    gold = oracle.frames(dumps, "fxd_imdct", N)
    gold_e = dumps["fxd_exp_imdct"]
    n = len(gold)
    full = np.zeros((n, N), np.int64)
    full[:, :yLen] = spec
    ytda, y_e, y_s, zero = fi.batch_dct4(full, exps, N)
    w = fi.window_table(N)
    wLen = len(w)
    st = fi.ImdctState(N, wLen)
    for f in range(n):
        x, xe = fi.imdct_ola(ytda[f], y_e[f], y_s[f], zero[f], w, N, wLen, st)
        assert xe == gold_e[f], f"imdct exp frame {f}: {xe} vs {gold_e[f]}"
        assert np.array_equal(x, gold[f]), f"imdct frame {f}"


def test_ltpf(point):
    """Fixed LTPF post-filter: IMDCT output + ltpf params -> Word16 out,
    bit-exact incl. exponent and x/y history carry
    (process_ltpf_decoder_fx, ltpf_decoder_fx.c:16-240)."""
    from audio_codec_tpu.ops import fixed_ltpf as fl
    cfg, dumps = point
    N = cfg.frame_length
    x = oracle.frames(dumps, "fxd_imdct", N)
    xe = dumps["fxd_exp_imdct"]
    gold = oracle.frames(dumps, "fxd_ltpf", N)
    gold_e = dumps["fxd_exp_ltpf"]
    lidx = oracle.frames(dumps, "fxd_ltpfidx", 3)
    sfi = fl.scale_fac_idx_for(cfg.total_bits, cfg.fs_idx, cfg.frame_dms)
    st = fl.LtpfState(cfg.fs)
    for f in range(len(x)):
        y, ye = fl.ltpf_decode(st, x[f], int(xe[f]), cfg.fs_idx, N,
                               int(lidx[f][0]), int(lidx[f][1]),
                               int(lidx[f][2]), sfi)
        assert ye == gold_e[f], f"ltpf exp frame {f}: {ye} vs {gold_e[f]}"
        assert np.array_equal(y, gold[f]), f"ltpf frame {f}"


def test_full_decode(point):
    """Standalone bit-exact decode: our bitstream frontend + integer
    backend vs the ETSI fixed-point decoder's WAV, sample-for-sample
    (north-star decode conformance; delay trim per codec_exe.c:484-486,
    lc3_dec_get_delay = frame_length - 2*la_zeroes)."""
    from audio_codec_tpu.fixed_decoder import FixedDecoder
    from audio_codec_tpu.utils import bitstream_io as bio
    cfg, dumps = point
    wav_name = {8000: "thetest8", 16000: "thetest16", 24000: "thetest24",
                32000: "thetest32", 44100: "thetest44",
                48000: "thetest48"}[cfg.fs_in]
    bs = oracle.fx_encode(wav_name, cfg.bitrate)
    _, wav = oracle.fx_dec_dumps(bs, f"{wav_name}_{cfg.bitrate}")
    gold, _ = oracle.read_wav_mono(wav)
    h, frames = bio.read_all(bs)
    f = np.stack([np.frombuffer(x, np.uint8) for x in frames])
    pcm = FixedDecoder(cfg).decode(f).reshape(-1)
    delay = cfg.frame_length - 2 * cfg.la_zeroes
    out = pcm[delay: delay + h.signal_len]
    if len(out) < h.signal_len:     # exe zero-pads the tail to signal_len
        out = np.pad(out, (0, h.signal_len - len(out)))
    assert np.array_equal(out, gold[:, 0]), "decoded WAV differs"


def test_spectral_chain(point):
    """ari scaling -> residual -> noise fill -> gain -> TNS -> shaping,
    all integer-exact per frame (dec_lc3.c:156-235)."""
    cfg, dumps = point
    n = len(dumps["fxd_gg"])
    d = _sides(dumps, n, cfg.yLen)
    bad = 0
    for f in range(n):
        x, x_e = fd.ari_scaling(d["sq"][f])
        assert np.array_equal(x, d["spec_ari"][f]), f"ari frame {f}"
        assert x_e == d["exp_ari"][f]
        x = fd.residual_decode(x, x_e, d["resbits"][f], int(d["fillbits"][f]))
        assert np.array_equal(x, d["spec_res"][f]), f"residual frame {f}"
        if not d["zf"][f]:
            x, _ = fd.noise_filling(x, int(d["nfseed"][f]), x_e,
                                    int(d["facns"][f]), int(d["bw"][f]),
                                    cfg.frame_dms)
        assert np.array_equal(x, d["spec_nf"][f]), f"noisefill frame {f}"
        x, x_e = fd.apply_global_gain(x, x_e, int(d["gg"][f]),
                                      cfg.quantizedGainOff)
        assert np.array_equal(x, d["spec_gg"][f]) and x_e == d["exp_gg"][f], \
            f"gain frame {f}"
        x, x_e = fd.tns_decode(d["tnsidx"][f], x, x_e, d["tnsorder"][f],
                               int(d["bw"][f]), cfg.frame_dms)
        assert np.array_equal(x, d["spec_tns"][f]) and x_e == d["exp_tns"][f], \
            f"tns frame {f}"
        scf, scf_e = fd.sns_interpolate(d["scfq"][f], cfg.bands_number)
        scf_e, x_e = fd.scf_scaling(scf_e, x_e)
        from audio_codec_tpu import tables as T
        bo = np.asarray(T.bands_offset(cfg.fs_idx, cfg.frame_dms, cfg.hrmode))
        x = fd.mdct_shaping(x, scf, scf_e, bo)
        assert np.array_equal(x, d["spec_shaped"][f]), f"shaping frame {f}"
        assert x_e == d["exp_shaped"][f], f"shaping exp frame {f}"
    assert bad == 0
