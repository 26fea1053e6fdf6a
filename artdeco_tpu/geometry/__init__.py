from artdeco_tpu.geometry import lie, projection, robust, uncertainty  # noqa: F401
