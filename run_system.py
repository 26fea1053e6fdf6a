"""End-to-end entry point (reference ``run_system.py`` CLI surface).

Examples:
  python run_system.py -s /data/scene --config config/base.yaml -m out/
  python run_system.py -s synthetic:// -d synthetic --oracle --test_hold 8 -m out/
"""

import os

import numpy as np


def main():
    from artdeco_tpu.dataio.args import get_args
    from artdeco_tpu.dataio.dataset import load_dataset
    from artdeco_tpu.utils.config import load_config

    # persistent XLA compilation cache, keyed by machine fingerprint (a
    # stale cross-host entry executes as INVALID_ARGUMENT on this backend —
    # see artdeco_tpu/utils/cache.py)
    from artdeco_tpu.utils.cache import setup_compilation_cache

    setup_compilation_cache()

    args = get_args()
    np.random.seed(0)
    config = load_config(args.config)

    dataset = load_dataset(args)
    print(
        f"dataset: {len(dataset)} frames | slam {dataset.W_slam}x{dataset.H_slam}"
        f" | map {dataset.W_map}x{dataset.H_map}"
    )

    # model runner
    if args.oracle:
        from artdeco_tpu.models.oracle import OracleRunner

        runner = OracleRunner(
            (dataset.H_slam, dataset.W_slam), dataset.K_slam,
            config["matching"],
        )
        for i in range(len(dataset)):
            img, info = dataset[i]
            gt = info.get("Twc_gt")
            if gt is None:
                raise SystemExit("--oracle requires ground-truth poses")
            T = np.zeros(8, np.float32)
            T[:7] = gt
            T[7] = 1.0
            runner.register(dataset.transform.to_slam(img), i, T)
    else:
        import jax.numpy as jnp

        from artdeco_tpu.models import mast3r as M
        from artdeco_tpu.models.mast3r_infer import Mast3rRunner

        cfg_model = (
            M.MASt3RConfig() if args.model_size == "full"
            else M.tiny_config(compute_dtype=jnp.float32)
        )
        params = None
        if os.path.isfile(args.checkpoint_path):
            if args.checkpoint_path.endswith(".npz"):
                # pre-converted by scripts/convert_checkpoints.py
                from artdeco_tpu.utils.params_io import load_pytree_npz

                params = load_pytree_npz(args.checkpoint_path)
            else:
                from artdeco_tpu.models.convert_mast3r import (
                    convert_state_dict,
                )

                if args.checkpoint_path.endswith(".safetensors"):
                    from safetensors.numpy import load_file

                    sd = load_file(args.checkpoint_path)
                else:
                    import torch

                    ckpt = torch.load(args.checkpoint_path,
                                      map_location="cpu", weights_only=False)
                    sd = ckpt.get("model", ckpt)
                params = convert_state_dict(sd, cfg_model)
            print(f"loaded MASt3R weights from {args.checkpoint_path}")
        else:
            print(
                f"WARNING: no checkpoint at {args.checkpoint_path}; "
                "running with random weights (tracking will be meaningless)"
            )
        runner = Mast3rRunner.create(
            cfg_model, match_cfg=config["matching"], params=params,
            init_hw=(dataset.H_slam, dataset.W_slam),
        )

    from artdeco_tpu.runtime.system import System

    system = System(args, config, dataset, runner)

    if args.viewer_mode == "web":
        from artdeco_tpu.runtime.webviewer import WebViewer, serve_static_page

        viewer = WebViewer(system.scene_model, ip=args.ip, port=args.port)
        viewer.start_background()
        static_dir = os.path.join(
            os.path.dirname(os.path.abspath(__file__)),
            "artdeco_tpu", "runtime", "webviewer_static",
        )
        serve_static_page(args.ip, args.port + 1, static_dir)
        print(f"web viewer: http://{args.ip}:{args.port + 1}/ "
              f"(ws on :{args.port})")

    system.run()
    for _ in getattr(args, "save_at_finetune_epoch", []) or []:
        system.finetune(1)

    out_dir = args.model_path or "output"
    meta = system.save(out_dir)
    print(
        f"done: {meta['n_frames']} frames, {meta['n_keyframes']} keyframes, "
        f"{meta['n_gaussians']} gaussians, {meta['FPS']:.2f} FPS"
    )
    if meta.get("trajectory"):
        print("trajectory:", meta["trajectory"])


if __name__ == "__main__":
    main()
