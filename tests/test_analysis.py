"""Golden tests: encoder front-end vs instrumented ETSI oracle (16 kHz, 32 kbps)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from audio_codec_tpu.config import Config
from audio_codec_tpu.models import state as S
from audio_codec_tpu.ops import analysis, transforms
from tests import oracle

CFG = Config(fs_in=16000, bitrate=32000)
NFRAMES = 120


@pytest.fixture(scope="module")
def dumps():
    d, _ = oracle.enc_dumps("thetest16", 32000)
    return d


@pytest.fixture(scope="module")
def front_end(dumps):
    """Run the jitted front-end chain frame by frame, collecting outputs."""
    cfg = CFG
    x = oracle.frames(dumps, "enc_in", cfg.frame_length)[:NFRAMES]
    st = S.enc_state_init(cfg, 1)

    @jax.jit
    def step(st, xf):
        d, mdct_mem = transforms.mdct(cfg, xf, st.mdct_mem)
        y, mi, m50, mo = analysis.resample_12k8(cfg, xf, st.r12k8_mem_in,
                                                st.r12k8_mem_50, st.r12k8_mem_out)
        T0, nc, mem_pitch, ms12, ms6 = analysis.olpa(cfg, y, st.olpa_mem_s12k8,
                                                     st.olpa_mem_s6k4, st.olpa_mem_pitch)
        (param, bits, ltpf_mem_in, nc_out, mem_mem_nc, mem_on, pitch_out) = \
            analysis.ltpf_encode(cfg, y, T0, nc, st.ltpf_mem_in,
                                 st.ltpf_mem_normcorr, st.ltpf_mem_mem_normcorr,
                                 st.ltpf_mem_ltpf_on, st.ltpf_mem_pitch)
        ener = analysis.per_band_energy(cfg, d)
        bw = analysis.detect_cutoff_warped(cfg, ener)
        st = st.replace(mdct_mem=mdct_mem, r12k8_mem_in=mi, r12k8_mem_50=m50,
                        r12k8_mem_out=mo, olpa_mem_s12k8=ms12, olpa_mem_s6k4=ms6,
                        olpa_mem_pitch=mem_pitch, ltpf_mem_in=ltpf_mem_in,
                        ltpf_mem_normcorr=nc_out, ltpf_mem_mem_normcorr=mem_mem_nc,
                        ltpf_mem_ltpf_on=mem_on, ltpf_mem_pitch=pitch_out)
        return st, dict(y=y, T0=T0, nc=nc, param=param, bits=bits, ener=ener, bw=bw)

    outs = []
    for f in range(NFRAMES):
        st, o = step(st, jnp.asarray(x[f][None]))
        outs.append({k: np.asarray(v)[0] for k, v in o.items()})
    return outs


def test_resampler(dumps, front_end):
    gold = oracle.frames(dumps, "enc_s12k8", CFG.len_12k8 + 1)
    for f in range(NFRAMES):
        g = gold[f]
        err = np.abs(front_end[f]["y"] - g).max()
        assert err < 2e-3 * max(1.0, np.abs(g).max()), (f, err)


def test_olpa(dumps, front_end):
    T0 = oracle.frames(dumps, "enc_olpa_T0", 1)[:, 0]
    nc = oracle.frames(dumps, "enc_olpa_nc", 1)[:, 0]
    n_T0 = sum(int(front_end[f]["T0"]) != T0[f] for f in range(NFRAMES))
    assert n_T0 <= NFRAMES // 50, n_T0
    err = max(abs(float(front_end[f]["nc"]) - nc[f]) for f in range(NFRAMES)
              if int(front_end[f]["T0"]) == T0[f])
    assert err < 1e-3, err


def test_ltpf(dumps, front_end):
    param = oracle.frames(dumps, "enc_ltpf_param", 3)
    bits = oracle.frames(dumps, "enc_ltpf_bits", 1)[:, 0]
    T0 = oracle.frames(dumps, "enc_olpa_T0", 1)[:, 0]
    bad = 0
    for f in range(NFRAMES):
        if int(front_end[f]["T0"]) != T0[f]:
            continue  # upstream pitch differed -> params legitimately differ
        if not np.array_equal(front_end[f]["param"], param[f]) or \
           int(front_end[f]["bits"]) != bits[f]:
            bad += 1
    assert bad <= NFRAMES // 40, bad


def test_per_band_energy(dumps, front_end):
    gold = oracle.frames(dumps, "enc_ener", CFG.bands_number)
    for f in range(NFRAMES):
        g = gold[f]
        err = np.abs(front_end[f]["ener"] - g).max()
        assert err <= 1e-5 * max(1.0, np.abs(g).max()), (f, err)


def test_bw_detector(dumps, front_end):
    gold = oracle.frames(dumps, "enc_bwidx", 1)[:, 0]
    for f in range(NFRAMES):
        assert int(front_end[f]["bw"]) == gold[f], f
