from artdeco_tpu.runtime import system  # noqa: F401
