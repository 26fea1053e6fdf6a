"""Multi-chip mapper training: keyframe-data-parallel over an ICI mesh.

The reference has no collective backend at all (SURVEY.md §2.4 — its
"distribution" is 3 OS processes on one box).  The TPU-native scaling story
for the mapper is SPMD data parallelism over keyframes: each chip renders and
differentiates a different keyframe against the replicated Gaussian scene,
scene gradients are psum-averaged over the ``dp`` axis (visibility masks
union via pmax), and the shared Adam update runs replicated — one jitted
``shard_map`` per step, collectives riding ICI.

Per-keyframe pose/exposure rows are disjoint across devices, so their
updates combine with a psum of one-hot row deltas.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from artdeco_tpu.mapper import gaussians as G, keyframe as KF, losses
from artdeco_tpu.mapper.config import MapperConfig
from artdeco_tpu.mapper.scene_model import GlobalFeats, MlpCov, render_core
from artdeco_tpu.ops import adam
from artdeco_tpu.ops.ssim import fused_ssim


def _loss_fn(trained, r_kf, t_kf, e_kf, slab, dlw, gt, mono, K_lvl, bg,
             width, height, cfg: MapperConfig):
    slab_t = dataclasses.replace(slab, **trained["slab"])
    Rm = KF.sixd_to_mtx(r_kf)
    viewmat = jnp.concatenate(
        [jnp.concatenate([Rm, t_kf[:, None]], axis=1),
         jnp.asarray([[0.0, 0, 0, 1]])], axis=0
    )
    pkg = render_core(
        slab_t, trained["gfeat"], trained["mlp"], viewmat, e_kf,
        K_lvl, width, height, bg, cfg.sh_degree, cfg.low_pass_filter_eps,
        cfg.cluster_capacity,
    )
    rdk = losses.radial_decay_kernel(height, width, cfg.rad_decay)[None]
    l1 = jnp.mean(rdk * jnp.abs(pkg["render"] - gt))
    ssim_l = 1.0 - fused_ssim(pkg["render"], gt)
    depth_l = jnp.mean(rdk * jnp.abs(pkg["invdepth"] - mono))
    loss = (
        cfg.lambda_dssim * ssim_l + (1 - cfg.lambda_dssim) * l1 + dlw * depth_l
    )
    return loss, dict(loss=loss, vis=pkg["visibility"],
                      gvis=pkg["global_visibility"])


def make_dp_train_step(mesh: Mesh, cfg: MapperConfig, width: int, height: int):
    """Build the jitted data-parallel train step.

    Step signature:
      (slab, opt, gfeat, mlp, mlp_opt, mlp_lr, pool,
       kf_idx (B,), gt (B,3,H,W), mono (B,1,H,W), K (3,3), bg (B,3))
      -> (slab, opt, gfeat, mlp, mlp_opt, mlp_lr, pool, metrics)
    with B == mesh size along "dp".
    """

    def per_device(slab, opt, gfeat, mlp, mlp_opt, mlp_lr, pool,
                   kf_idx, gt, mono, K_lvl, bg):
        kf = kf_idx[0]
        gt0 = gt[0]
        mono0 = mono[0]
        bg0 = bg[0]
        trained0 = dict(
            slab={k: getattr(slab, k) for k in G.TRAINED_KEYS},
            gfeat=gfeat.val,
            mlp=mlp,
        )
        r0 = pool.r_w2c[kf]
        t0 = pool.t_w2c[kf]
        e0 = pool.exposure[kf]
        dlw = pool.depth_loss_weight[kf]
        grads, aux = jax.grad(
            _loss_fn, argnums=(0, 1, 2, 3), has_aux=True
        )(trained0, r0, t0, e0, slab, dlw, gt0, mono0, K_lvl, bg0,
          width, height, cfg)
        g_trained, g_r, g_t, g_e = grads

        # test frames train only their pose (h3dgsv3.py:458-464): zero their
        # scene-gradient contribution before the cross-device mean
        w_scene = jnp.where(pool.is_test[kf], 0.0, 1.0)
        # scene gradients: mean across the dp axis; visibility: union
        g_scene = jax.tree_util.tree_map(
            lambda x: jax.lax.pmean(w_scene * x, "dp"), g_trained
        )
        vis = jax.lax.pmax(
            (aux["vis"] & ~pool.is_test[kf]).astype(jnp.int32), "dp") > 0
        gvis = jax.lax.pmax(
            (aux["gvis"] & ~pool.is_test[kf]).astype(jnp.int32), "dp") > 0
        loss = jax.lax.pmean(aux["loss"], "dp")

        # ---- replicated scene update ---------------------------------
        lrs = dict(
            f_dc=cfg.feature_lr, f_rest=cfg.feature_lr / 20.0,
            scaling=cfg.scaling_lr, rotation=cfg.rotation_lr,
            opacity=cfg.opacity_lr, local_feat=cfg.feat_lr, xyz=None,
        )
        slab, opt = G.apply_adam(
            slab, opt, g_scene["slab"], vis, lrs,
            cfg.adam_b1, cfg.adam_b2, cfg.adam_eps,
        )
        slab = G.decay_xyz_lr(
            slab, vis, cfg.position_lr_decay, cfg.position_lr_init * 0.1
        )
        gv, g_opt = adam.adam_update_masked(
            gfeat.val, g_scene["gfeat"], gfeat.opt, gfeat.lr, gvis,
            b1=cfg.adam_b1, b2=cfg.adam_b2, eps=cfg.adam_eps,
        )
        gfeat = GlobalFeats(val=gv, lr=gfeat.lr, opt=g_opt)
        new_mlp = {}
        new_mlp_opt = {}
        for name in ("w1", "b1", "w2", "b2"):
            p, st = adam.adam_update_basic(
                getattr(mlp, name), getattr(g_scene["mlp"], name),
                mlp_opt[name], mlp_lr, b1=cfg.adam_b1, b2=cfg.adam_b2,
                eps=cfg.adam_eps,
            )
            new_mlp[name] = p
            new_mlp_opt[name] = st
        mlp = MlpCov(**new_mlp)
        mlp_opt = new_mlp_opt
        mlp_lr = jnp.maximum(
            mlp_lr * cfg.mlp_cov_lr_decay, cfg.mlp_cov_lr_init * 0.1
        )

        # ---- per-keyframe row updates (disjoint rows; psum deltas) ----
        lr_pose = pool.lr_pose[kf]
        lr_expo = jnp.where(pool.is_test[kf], 0.0, pool.lr_exposure[kf])
        r_new, st_r = adam.adam_update_basic(
            r0, g_r, adam.AdamState(pool.opt_r.exp_avg[kf],
                                    pool.opt_r.exp_avg_sq[kf]),
            lr_pose, b1=0.8, b2=0.99,
        )
        t_new, st_t = adam.adam_update_basic(
            t0, g_t, adam.AdamState(pool.opt_t.exp_avg[kf],
                                    pool.opt_t.exp_avg_sq[kf]),
            lr_pose, b1=0.8, b2=0.99,
        )
        e_new, st_e = adam.adam_update_basic(
            e0, g_e, adam.AdamState(pool.opt_e.exp_avg[kf],
                                    pool.opt_e.exp_avg_sq[kf]),
            lr_expo, b1=0.8, b2=0.99,
        )

        def row_delta(dest, row_new, row_old):
            d = jnp.zeros_like(dest).at[kf].set(row_new - row_old)
            return jax.lax.psum(d, "dp")

        pool = dataclasses.replace(
            pool,
            r_w2c=pool.r_w2c + row_delta(pool.r_w2c, r_new, r0),
            t_w2c=pool.t_w2c + row_delta(pool.t_w2c, t_new, t0),
            exposure=pool.exposure + row_delta(pool.exposure, e_new, e0),
            opt_r=adam.AdamState(
                pool.opt_r.exp_avg
                + row_delta(pool.opt_r.exp_avg, st_r.exp_avg,
                            pool.opt_r.exp_avg[kf]),
                pool.opt_r.exp_avg_sq
                + row_delta(pool.opt_r.exp_avg_sq, st_r.exp_avg_sq,
                            pool.opt_r.exp_avg_sq[kf]),
            ),
            opt_t=adam.AdamState(
                pool.opt_t.exp_avg
                + row_delta(pool.opt_t.exp_avg, st_t.exp_avg,
                            pool.opt_t.exp_avg[kf]),
                pool.opt_t.exp_avg_sq
                + row_delta(pool.opt_t.exp_avg_sq, st_t.exp_avg_sq,
                            pool.opt_t.exp_avg_sq[kf]),
            ),
            opt_e=adam.AdamState(
                pool.opt_e.exp_avg
                + row_delta(pool.opt_e.exp_avg, st_e.exp_avg,
                            pool.opt_e.exp_avg[kf]),
                pool.opt_e.exp_avg_sq
                + row_delta(pool.opt_e.exp_avg_sq, st_e.exp_avg_sq,
                            pool.opt_e.exp_avg_sq[kf]),
            ),
        )
        return slab, opt, gfeat, mlp, mlp_opt, mlp_lr, pool, dict(loss=loss)

    rep = P()
    dp = P("dp")
    in_specs = (rep,) * 7 + (dp, dp, dp, rep, dp)
    out_specs = (rep,) * 7 + (rep,)
    sharded = jax.shard_map(
        per_device, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
        check_vma=False,
    )
    return jax.jit(sharded)
