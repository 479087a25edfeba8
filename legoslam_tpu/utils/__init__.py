from legoslam_tpu.utils.config import Config  # noqa: F401
from legoslam_tpu.utils.timer import Timer  # noqa: F401
