from artdeco_tpu.ops import matching  # noqa: F401
