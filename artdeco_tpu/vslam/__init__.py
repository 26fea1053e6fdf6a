from artdeco_tpu.vslam import frame, keyframes, tracker  # noqa: F401
