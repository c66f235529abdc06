from camera_calibration_tpu.ops import (  # noqa: F401
    bspline,
    dlt,
    linalg,
    losses,
    manifolds,
    se3,
)
