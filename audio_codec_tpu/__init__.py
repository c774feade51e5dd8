"""audio_codec_tpu — a TPU-native LC3plus (ETSI TS 103 634) codec framework.

Batched JAX/XLA/Pallas reimplementation of the LC3plus encoder/decoder:
thousands of independent streams ride a [n_streams, ...] batch axis, sharded
over device meshes with shard_map; the ETSI reference codec is used only as
the conformance oracle (see SURVEY.md).
"""
import jax as _jax

# The codec's transforms run as f32 matmuls on the MXU; the TPU default
# (bf16 inputs) is not accurate enough for conformance (RMS >= 14-bit vs the
# ETSI reference), so f32-true matmul precision is forced package-wide.
_jax.config.update("jax_default_matmul_precision", "highest")

from .config import Config

__all__ = ["Config"]
