from artdeco_tpu.models import mast3r, mast3r_infer  # noqa: F401
