from artdeco_tpu.eval import trajectory  # noqa: F401
