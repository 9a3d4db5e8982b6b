"""vrvq_tpu — TPU-native variable-bitrate RVQ neural audio codec framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the VRVQ
reference (lixinghe1999/VRVQ, ICASSP 2025): a DAC-style fully-convolutional
44.1 kHz codec with a per-frame importance map that gates how many RVQ
codebooks each latent frame uses, giving variable-bitrate coding from one
trained model.

Design stance (TPU-first, not a torch translation):
  * channels-last (B, T, C) layouts internally so the channel dim rides the
    128-lane VPU/MXU axis; public APIs keep the reference's (B, C, T) shapes
  * pure-functional flax modules over param pytrees, one jit program per op
  * static shapes everywhere; batch partitioning via masks, not slicing
  * PRNG keys threaded explicitly for level sampling / quantizer dropout
  * multi-chip scaling via jax.sharding.Mesh + NamedSharding data parallelism
  * hot quantization path available as a fused Pallas kernel (ops.rvq_kernel),
    wired into serving via CodecProcessor(fused_quantizer=True)
  * serving stack: chunked compress/decompress (.dac, bit-packed +
    optionally range-coded), push-style live streaming with an
    entropy-coded wire format (infer.streaming), native C++ IO/coders
    with pure-Python fallbacks (native/io)
"""

__version__ = "0.1.0"

from . import config
from .audio import Signal
