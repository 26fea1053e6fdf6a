import os

from artdeco_tpu.utils.config import load_config, merge_config

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_load_base_config():
    cfg = load_config(os.path.join(REPO, "config/base.yaml"))
    # float resolver: 1e-8 must parse as float, not str
    assert isinstance(cfg["matching"]["lambda_init"], float)
    assert cfg["matching"]["lambda_init"] == 1e-8
    assert cfg["tracking"]["max_iters"] == 50
    assert cfg["use_calib"] is True


def test_inherit_merge(tmp_path):
    base = os.path.join(REPO, "config/base.yaml")
    child = tmp_path / "child.yaml"
    child.write_text(f"inherit: {base}\nmatching:\n  radius: 9\n")
    cfg = load_config(str(child))
    assert cfg["matching"]["radius"] == 9
    assert cfg["matching"]["max_iter"] == 10  # inherited
    assert cfg["tracking"]["huber"] == 1.345


def test_merge_config_nested():
    a = {"x": {"y": 1, "z": 2}, "k": 3}
    b = {"x": {"y": 10}, "n": 5}
    out = merge_config(a, b)
    assert out == {"x": {"y": 10, "z": 2}, "k": 3, "n": 5}


def test_outdoor_profile():
    cfg = load_config(os.path.join(REPO, "config/base_outdoor.yaml"))
    assert cfg["matching"]["dist_thresh"] == 0.3
    assert cfg["matching"]["radius"] == 5
    assert cfg["tracking"]["max_iters"] == 50  # inherited
