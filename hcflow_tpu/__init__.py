"""HCFlow-TPU: a TPU-native (JAX/XLA/Pallas) hierarchical conditional flow framework.

Re-implements the capabilities of JingyunLiang/HCFlow (ICCV 2021, arXiv 2108.05301)
as a from-scratch, TPU-first design:

- every invertible op is a pure function pair ``forward(params, x, cond) -> (y, logdet)``
  / ``inverse(params, y, cond) -> x`` operating on NHWC tensors,
- homogeneous flow-step sequences are executed with ``lax.scan`` over stacked
  parameter pytrees (fast compile, MXU-friendly),
- data-dependent ActNorm initialization is an explicit calibration pass,
- sampling temperature / dequantization noise use explicit ``jax.random`` keys,
- data parallelism is a 1-D ``jax.sharding.Mesh`` with XLA-inserted collectives.
"""

__version__ = "0.1.0"
