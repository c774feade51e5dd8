"""Stream-mesh engine: sharded execution is bit-identical to unsharded,
and stream migration (the elastic-rebalancing primitive) moves state
without perturbing outputs (SURVEY.md §2.7)."""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from audio_codec_tpu.config import Config
from audio_codec_tpu.models import encoder as enc_m
from audio_codec_tpu.models import state as S
from audio_codec_tpu.parallel import engine as pe
from audio_codec_tpu.parallel import mesh as pm

CFG = Config(fs_in=16000, bitrate=32000)


def _pcm(b, n, seed=0):
    rng = np.random.default_rng(seed)
    return (rng.standard_normal((b, n)) * 3000.0).astype(np.float32)


def _ref_step(st, pcm):
    st, out, _ = jax.jit(
        lambda s, p: enc_m.encode_frame(CFG, s, p))(st, jnp.asarray(pcm))
    return st, np.asarray(out)


def test_sharded_encode_bit_identical_to_unsharded():
    mesh = pm.stream_mesh(jax.devices()[:8])
    B = 16
    enc = pe.ShardedEncoder(CFG, B, mesh)
    st = S.enc_state_init(CFG, B)
    for f in range(3):
        pcm = _pcm(B, CFG.frame_length, seed=f)
        got = np.asarray(enc.step(jnp.asarray(pcm)))
        st, ref = _ref_step(st, pcm)
        np.testing.assert_array_equal(got, ref)


def test_migrate_streams_moves_state_and_preserves_outputs():
    mesh = pm.stream_mesh(jax.devices()[:8])
    B = 8  # one stream per device: migration roll == lane roll
    enc = pe.ShardedEncoder(CFG, B, mesh)
    enc.step(jnp.asarray(_pcm(B, CFG.frame_length, seed=1)))  # distinct history

    old = jax.device_get(enc.state)
    perm = [(i, (i + 1) % 8) for i in range(8)]   # ring shift: i -> i+1
    enc.state = pe.migrate_streams(mesh, enc.state, perm)
    new = jax.device_get(enc.state)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.roll(a, 1, axis=0), b),
        old, new)

    # the migrated streams keep producing bit-identical payloads
    pcm2 = _pcm(B, CFG.frame_length, seed=2)
    got = np.asarray(enc.step(jnp.asarray(np.roll(pcm2, 1, axis=0))))
    st_ref = jax.tree_util.tree_map(
        lambda a: jnp.asarray(np.roll(a, 1, axis=0)), old)
    _, ref = _ref_step(st_ref, np.roll(pcm2, 1, axis=0))
    np.testing.assert_array_equal(got, ref)


def test_migration_runner_rebalances_after_device_loss():
    """Elastic serving: drain a 'failed' device's streams onto the rest of
    the mesh and continue bit-identically on the smaller mesh."""
    B = 8
    enc = pe.ShardedEncoder(CFG, B, pm.stream_mesh(jax.devices()[:8]))
    enc.step(jnp.asarray(_pcm(B, CFG.frame_length, seed=3)))
    full = jax.device_get(enc.state)

    # device 7 is lost: rebuild on 4 devices, repacking all 8 streams
    mesh4 = pm.stream_mesh(jax.devices()[:4])
    enc2 = pe.ShardedEncoder(CFG, B, mesh4)
    enc2.state = pm.shard_state(mesh4, jax.device_put(full))
    pcm2 = _pcm(B, CFG.frame_length, seed=4)
    got = np.asarray(enc2.step(jnp.asarray(pcm2)))
    st_ref = jax.device_put(full)
    _, ref = _ref_step(st_ref, pcm2)
    np.testing.assert_array_equal(got, ref)
