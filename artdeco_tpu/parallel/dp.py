"""Multi-chip mapper training: keyframe-data-parallel over an ICI mesh.

The reference has no collective backend at all (SURVEY.md §2.4 — its
"distribution" is 3 OS processes on one box).  The TPU-native scaling story
for the mapper is SPMD data parallelism over keyframes: each chip renders and
differentiates a different keyframe against the replicated Gaussian scene,
scene gradients are psum-averaged over the ``dp`` axis (visibility masks
union via pmax), and the shared Adam update runs replicated — one jitted
``shard_map`` per step, collectives riding ICI.

Objective parity with the single-chip ``optimization_step_core``
(mapper/scene_model.py): identical loss terms (radial-decay L1, fused SSIM,
depth, scaling regularizer), the common-frame error masking when
``is_important`` is False (h3dgsv3.py:432-439), per-row depth-loss-weight
decay, and test frames that train only their pose (h3dgsv3.py:458-464) —
their scene-gradient contribution is excluded and the cross-device mean is
taken over the NON-test count, not the mesh size.

Per-keyframe pose/exposure rows combine with a psum of one-hot row deltas.
Devices may sample the SAME keyframe (replay sampling is with replacement
when few keyframes exist), so every row delta is divided by the psum'd
per-row multiplicity — k devices training one keyframe apply the AVERAGE of
their k Adam steps once, never k stacked steps.
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
             width, height, is_important: bool, cfg: MapperConfig):
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
    image = pkg["render"]
    invdepth = pkg["invdepth"]
    rdk = losses.radial_decay_kernel(height, width, cfg.rad_decay)[None]
    if not is_important:
        # common frames: mask pixels with large errors (h3dgsv3.py:432-439)
        err = rdk * jnp.abs(image - gt)
        bad = (err[0] > 0.2) | (err[1] > 0.2) | (err[2] > 0.2)
        m = (~bad)[None].astype(image.dtype)
        image = image * m
        gt = gt * m
        invdepth = invdepth * m
        mono = mono * m
    l1 = jnp.mean(rdk * jnp.abs(image - gt))
    ssim_l = 1.0 - fused_ssim(image, gt)
    depth_l = jnp.mean(rdk * jnp.abs(invdepth - mono))
    scaling_reg = jnp.mean(jnp.prod(pkg["scale"], axis=1))
    loss = (
        cfg.lambda_dssim * ssim_l + (1 - cfg.lambda_dssim) * l1
        + dlw * depth_l + cfg.scaling_reg_factor * scaling_reg
    )
    return loss, dict(loss=loss, vis=pkg["visibility"],
                      gvis=pkg["global_visibility"])


def make_dp_train_step(mesh: Mesh, cfg: MapperConfig, width: int, height: int,
                       is_important: bool = True):
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
          width, height, is_important, cfg)
        g_trained, g_r, g_t, g_e = grads

        # test frames train only their pose (h3dgsv3.py:458-464): exclude
        # their scene-gradient contribution; mean over the NON-test count
        # (a plain pmean would attenuate scene grads whenever a test frame
        # is in the batch)
        w_scene = jnp.where(pool.is_test[kf], 0.0, 1.0)
        n_scene = jax.lax.psum(w_scene, "dp")
        g_scene = jax.tree_util.tree_map(
            lambda x: jax.lax.psum(w_scene * x, "dp")
            / jnp.maximum(n_scene, 1.0),
            g_trained,
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
        slab_n, opt_n = G.apply_adam(
            slab, opt, g_scene["slab"], vis, lrs,
            cfg.adam_b1, cfg.adam_b2, cfg.adam_eps,
        )
        slab_n = G.decay_xyz_lr(
            slab_n, vis, cfg.position_lr_decay, cfg.position_lr_init * 0.1
        )
        gv, g_opt = adam.adam_update_masked(
            gfeat.val, g_scene["gfeat"], gfeat.opt, gfeat.lr, gvis,
            b1=cfg.adam_b1, b2=cfg.adam_b2, eps=cfg.adam_eps,
        )
        gfeat_n = GlobalFeats(val=gv, lr=gfeat.lr, opt=g_opt)
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
        mlp_n = MlpCov(**new_mlp)
        mlp_lr_n = jnp.maximum(
            mlp_lr * cfg.mlp_cov_lr_decay, cfg.mlp_cov_lr_init * 0.1
        )
        # an all-test batch performs NO scene/mlp update at all (the
        # single-chip step skips the whole block when is_test)
        any_scene = n_scene > 0

        def sel(new, old):
            return jax.tree_util.tree_map(
                lambda a, b: jnp.where(any_scene, a, b), new, old
            )

        slab = sel(slab_n, slab)
        opt = sel(opt_n, opt)
        gfeat = sel(gfeat_n, gfeat)
        mlp = sel(mlp_n, mlp)
        mlp_opt = sel(new_mlp_opt, mlp_opt)
        mlp_lr = jnp.where(any_scene, mlp_lr_n, mlp_lr)

        # ---- per-keyframe row updates --------------------------------
        # Devices may share a keyframe (sampling with replacement): psum a
        # one-hot multiplicity and divide each row delta by it, so k devices
        # apply the AVERAGE of their k Adam steps exactly once.
        Pn = pool.r_w2c.shape[0]
        mult = jax.lax.psum(
            jnp.zeros((Pn,), jnp.float32).at[kf].set(1.0), "dp"
        )
        mult_inv = 1.0 / jnp.maximum(mult, 1.0)

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
            s = jax.lax.psum(d, "dp")
            return s * mult_inv.reshape((Pn,) + (1,) * (dest.ndim - 1))

        # per-row depth-loss-weight decay (single-chip multiplies the
        # trained row by decay once per step; duplicates decay once)
        dlw_new = dlw * cfg.depth_loss_weight_decay

        pool = dataclasses.replace(
            pool,
            r_w2c=pool.r_w2c + row_delta(pool.r_w2c, r_new, r0),
            t_w2c=pool.t_w2c + row_delta(pool.t_w2c, t_new, t0),
            exposure=pool.exposure + row_delta(pool.exposure, e_new, e0),
            depth_loss_weight=pool.depth_loss_weight + row_delta(
                pool.depth_loss_weight, dlw_new, dlw),
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
