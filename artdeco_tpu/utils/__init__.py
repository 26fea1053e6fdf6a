from artdeco_tpu.utils import config  # noqa: F401
