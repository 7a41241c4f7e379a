"""rodygs_tpu — TPU-native dynamic Gaussian-splatting framework.

From-scratch JAX/XLA/Pallas implementation with the capabilities of RoDyGS
(POSTECH-CVLab/RoDyGS). See DESIGN.md for the architecture map.
"""

import jax

# Geometry/compositing math needs true fp32 matmuls (TPU MXU defaults to
# bf16 inputs; SURVEY.md §7 "matching numerics"). Hot paths that can tolerate
# bf16 (e.g. the motion-basis MLP) opt in explicitly via dtype.
jax.config.update("jax_default_matmul_precision", "float32")

__version__ = "0.1.0"
