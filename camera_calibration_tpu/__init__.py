"""TPU-native geometric camera calibration engine.

A brand-new JAX/XLA/Pallas implementation of generic ("10k parameter")
camera calibration: spline-grid camera models, feature detection with
sub-pixel corner refinement, dense SfM-style initialization, and joint
bundle adjustment over poses / pattern geometry / intrinsics — designed
TPU-first (functional pytree state, vmapped kernels, matrix-free LM+PCG,
mesh sharding) rather than as a port of the C++/CUDA reference
(puzzlepaint/camera_calibration).
"""

__version__ = "0.1.0"

from camera_calibration_tpu import config  # noqa: F401  (sets matmul precision)
from camera_calibration_tpu import ops  # noqa: F401
