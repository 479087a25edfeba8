from legoslam_tpu.ops import interp, pyramid, klt, detect  # noqa: F401
