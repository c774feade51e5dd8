"""audio_codec_tpu — a TPU-native LC3plus (ETSI TS 103 634) codec framework.

Batched JAX/XLA/Pallas reimplementation of the LC3plus encoder/decoder:
thousands of independent streams ride a [n_streams, ...] batch axis, sharded
over device meshes with shard_map; the ETSI reference codec is used only as
the conformance oracle (see SURVEY.md).
"""
from .config import Config

__all__ = ["Config"]
