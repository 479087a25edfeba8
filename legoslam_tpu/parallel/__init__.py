from legoslam_tpu.parallel import mesh, dist_ba  # noqa: F401
