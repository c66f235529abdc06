from camera_calibration_tpu.models import (  # noqa: F401
    base,
    central_generic,
    fit,
    pinhole,
)
from camera_calibration_tpu.models.central_generic import (  # noqa: F401
    CentralGenericModel,
)
from camera_calibration_tpu.models.pinhole import PinholeCamera  # noqa: F401
