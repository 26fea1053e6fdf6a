from artdeco_tpu.poses import (  # noqa: F401
    feature_detector, guided_mvs, matcher, mini_ba, pnp, ransac, triangulator,
)
