from artdeco_tpu.dataio import camera, dataset, tum_io  # noqa: F401
