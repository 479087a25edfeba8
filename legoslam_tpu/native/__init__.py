from legoslam_tpu.native import loader  # noqa: F401
