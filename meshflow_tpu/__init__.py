"""meshflow_tpu — a TPU-native MeshFlow video-stabilization framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the reference
implementation of "MeshFlow: Minimum Latency Online Video Stabilization"
(Liu et al., ECCV 2016): whole-clip stabilization as batched device compute
(corner detection, pyramidal Lucas-Kanade, RANSAC homographies, masked-median
motion propagation, banded Jacobi energy minimization, mesh warping) with
frame-axis sharding across chips, while preserving the reference's public API
(/root/reference/meshflowstabilizer.py:43-169):

    MeshFlowStabilizer(...).stabilize(input_path, output_path,
                                      adaptive_weights_definition=...)
    -> (cropping_ratio, distortion_score, stability_score)
"""

import os as _os

import jax as _jax

# Some TPU plugins (e.g. the tunneled "axon" platform here) ignore the
# JAX_PLATFORMS env var; the config flag is honored.  MESHFLOW_PLATFORM gives
# users and subprocess tests a reliable backend override.
_platform = _os.environ.get("MESHFLOW_PLATFORM")
if _platform:
    _jax.config.update("jax_platforms", _platform)

# This JAX build lowers float32 matmuls/convolutions to bfloat16 inputs by
# default (~1e-2 relative error).  This framework's FLOP-heavy work is
# gathers and elementwise VPU ops; its matmuls are small, precision-critical
# solves (DLT/SVD/Gauss-Newton, which on TPU decompose into matmuls
# internally).  Pin the default to full float32; hot kernels that can afford
# bfloat16 opt in explicitly.
_jax.config.update("jax_default_matmul_precision", "highest")

from meshflow_tpu.config import (  # noqa: E402,F401
    ADAPTIVE_WEIGHTS_DEFINITION_ORIGINAL,
    ADAPTIVE_WEIGHTS_DEFINITION_FLIPPED,
    ADAPTIVE_WEIGHTS_DEFINITION_CONSTANT_HIGH,
    ADAPTIVE_WEIGHTS_DEFINITION_CONSTANT_LOW,
    ADAPTIVE_WEIGHTS_DEFINITION_CONSTANT_HIGH_VALUE,
    ADAPTIVE_WEIGHTS_DEFINITION_CONSTANT_LOW_VALUE,
    MeshFlowConfig,
)

__version__ = "0.1.0"

__all__ = [
    "MeshFlowConfig",
    "MeshFlowStabilizer",
    "ADAPTIVE_WEIGHTS_DEFINITION_ORIGINAL",
    "ADAPTIVE_WEIGHTS_DEFINITION_FLIPPED",
    "ADAPTIVE_WEIGHTS_DEFINITION_CONSTANT_HIGH",
    "ADAPTIVE_WEIGHTS_DEFINITION_CONSTANT_LOW",
    "ADAPTIVE_WEIGHTS_DEFINITION_CONSTANT_HIGH_VALUE",
    "ADAPTIVE_WEIGHTS_DEFINITION_CONSTANT_LOW_VALUE",
    "__version__",
]


def __getattr__(name):
    # Lazy import: the api module pulls in cv2-backed IO, which not every
    # consumer of the kernels needs.
    if name == "MeshFlowStabilizer":
        from meshflow_tpu.api import MeshFlowStabilizer

        return MeshFlowStabilizer
    raise AttributeError(f"module 'meshflow_tpu' has no attribute {name!r}")
