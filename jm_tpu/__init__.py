"""jm_tpu — a TPU-native H.264/AVC encode/decode engine in JAX/XLA/Pallas.

A from-scratch reimplementation of the capabilities of the JM 19.0 reference
software (lencod/ldecod): Baseline/Main/High-profile encoding with
full-search and fast motion estimation, quarter-pel interpolation, intra
prediction, 4x4/8x8 integer transforms and quantization, CAVLC and CABAC
entropy coding, in-loop deblocking, RD-optimized mode decision — redesigned
TPU-first: batched macroblock-tile kernels, wavefront scheduling, and
pjit/shard_map sharding instead of serial per-MB raster loops.

Package layout:
  common/     shared types, constants, normative tables
  bitstream/  NAL framing, bit readers/writers, Exp-Golomb
  ops/        batched compute kernels (jnp reference + Pallas TPU paths)
  decoder/    two-phase decoder (host parse -> device reconstruction)
  encoder/    wavefront encoder (batched mode decision, ME, entropy)
  parallel/   mesh/sharding helpers (MB-row, slice, GOP, view parallelism)
  models/     profile pipelines (baseline/main/high presets)
  io/         YUV/raw video I/O
  utils/      tracing, metrics, timing
"""

__version__ = "0.1.0"
