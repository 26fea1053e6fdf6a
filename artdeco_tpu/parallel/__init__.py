from artdeco_tpu.parallel import dp  # noqa: F401
