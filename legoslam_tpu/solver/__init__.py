from legoslam_tpu.solver import robust, reprojection, schur, lm, pcg  # noqa: F401
