"""Camera tracker: two-view Sim(3) pose optimization against the last keyframe.

Reference: ``VSLAM/CameraTracker.py:19-397``.  The reference runs a Python
LM loop of <=50 iterations with per-iteration torch ops and a host Cholesky;
here the whole loop is a single jitted ``lax.while_loop`` over fixed-size
pixel sets — one XLA computation per tracked frame.  Residual/Jacobian
assembly is a batched einsum that XLA maps onto the MXU.

Failure semantics: the reference catches Cholesky exceptions to signal a lost
frame (CameraTracker.py:131-133); we detect non-finite solves in-graph and
return an ``ok`` flag instead.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from artdeco_tpu.geometry import lie, projection as proj, robust
from artdeco_tpu.geometry.uncertainty import local_diag_cov


class TrackingConfig(NamedTuple):
    """Static numeric knobs (config/base.yaml tracking block)."""

    min_match_frac: float = 0.05
    max_iters: int = 50
    C_conf: float = 0.0
    Q_conf: float = 1.5
    rel_error: float = 1e-3
    delta_norm: float = 1e-3
    huber: float = 1.345
    match_frac_thresh: float = 0.333
    sigma_ray: float = 0.003
    sigma_dist: float = 10.0
    sigma_pixel: float = 1.0
    sigma_depth: float = 10.0
    sigma_point: float = 0.05
    pixel_border: int = -10
    depth_eps: float = 1e-6
    # TPU redesign: subsample the LM residual set by this pixel stride (the
    # reference solves over every pixel, CameraTracker.py:296-396 — a 7-DoF
    # pose is massively overdetermined either way, and per-LM-iteration cost
    # scales with this).  Keyframe decisions and match fractions always use
    # the full-resolution arrays.
    point_stride: int = 1

    @staticmethod
    def from_dict(d: dict) -> "TrackingConfig":
        fields = TrackingConfig._fields
        return TrackingConfig(**{k: v for k, v in d.items() if k in fields})


def masked_quantile(x: jax.Array, mask: jax.Array, q: float) -> jax.Array:
    """torch.quantile-compatible (linear interpolation) over masked entries."""
    big = jnp.finfo(x.dtype).max
    xs = jnp.sort(jnp.where(mask, x, big))
    n = jnp.sum(mask)
    pos = q * (n.astype(x.dtype) - 1.0)
    lo = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, x.shape[0] - 1)
    hi = jnp.clip(lo + 1, 0, x.shape[0] - 1)
    frac = pos - lo.astype(x.dtype)
    lo_v = xs[lo]
    hi_v = jnp.where(hi < n, xs[hi], lo_v)
    return jnp.where(n > 0, lo_v + frac * (hi_v - lo_v), 0.0)


def _solve_gn(sqrt_info: jax.Array, r: jax.Array, J: jax.Array, huber_k: float):
    """Whitened + Huber-weighted normal equations (CameraTracker.solve :223-238).

    sqrt_info, r: (N, D); J: (N, D, M). Returns (tau (M,), cost, ok).
    """
    whitened_r = sqrt_info * r
    robust_sqrt_info = sqrt_info * jnp.sqrt(robust.huber(whitened_r, k=huber_k))
    mdim = J.shape[-1]
    A = (robust_sqrt_info[..., None] * J).reshape(-1, mdim)
    b = (robust_sqrt_info * r).reshape(-1, 1)
    # normal equations in full f32: TPU's default matmul precision is bf16,
    # which biases the 7-DoF solve by ~4e-2 in the Sim(3) tangent (measured
    # on v5e with exact correspondences); HIGHEST costs ~nothing at (N, 8)
    H = jnp.matmul(A.T, A, precision=jax.lax.Precision.HIGHEST)
    g = -jnp.matmul(A.T, b, precision=jax.lax.Precision.HIGHEST)
    cost = 0.5 * jnp.sum(b * b)
    L, lower = jax.scipy.linalg.cho_factor(H, lower=True)
    tau = jax.scipy.linalg.cho_solve((L, lower), g)[:, 0]
    ok = jnp.isfinite(tau).all()
    tau = jnp.where(ok, tau, 0.0)
    return tau, cost, ok


@partial(jax.jit, static_argnames=("cfg",))
def opt_pose_ray_dist_sim3(
    Xf: jax.Array,  # (N, 3) frame points matched per keyframe pixel
    Xk: jax.Array,  # (N, 3) keyframe points
    T_WCf: jax.Array,  # (8,)
    T_WCk: jax.Array,  # (8,)
    Qk: jax.Array,  # (N, 1) match score
    valid: jax.Array,  # (N, 1) bool
    cfg: TrackingConfig = TrackingConfig(),
):
    """Uncalibrated tracking: ray + distance residuals (reference :242-290).

    Traced under f32 matmul precision: TPU's default bf16 passes bias the
    Jacobian products and the pose solve by ~4e-2 in the Sim(3) tangent."""
    with jax.default_matmul_precision("highest"):
        return _opt_pose_ray_dist_sim3_body(
            Xf, Xk, T_WCf, T_WCk, Qk, valid, cfg
        )


def _opt_pose_ray_dist_sim3_body(Xf, Xk, T_WCf, T_WCk, Qk, valid, cfg):
    sqrt_q = jnp.sqrt(Qk)
    v = valid.astype(Xf.dtype)
    si_ray = (1.0 / cfg.sigma_ray) * v * sqrt_q
    si_dist = (1.0 / cfg.sigma_dist) * v * sqrt_q
    sqrt_info = jnp.concatenate([jnp.repeat(si_ray, 3, -1), si_dist], axis=1)

    T0 = lie.sim3_mul(lie.sim3_inv(T_WCk), T_WCf)
    rd_k = proj.point_to_ray_dist(Xk)

    def cond(c):
        step, T, old_cost, done, ok = c
        return (step < cfg.max_iters) & (~done) & ok

    def body(c):
        step, T, old_cost, done, ok = c
        Xf_Ck, dX_dT = lie.sim3_act_jac(T, Xf)
        rd_f, drd_dX = proj.point_to_ray_dist(Xf_Ck, jacobian=True)
        r = rd_k - rd_f
        J = -(drd_dX @ dX_dT)
        tau, new_cost, ok_i = _solve_gn(sqrt_info, r, J, cfg.huber)
        T = lie.sim3_normalize(lie.sim3_retr(T, tau))
        done = robust.check_convergence(
            cfg.rel_error, cfg.delta_norm, old_cost, new_cost, tau
        )
        return step + 1, T, new_cost, done, ok & ok_i

    init = (jnp.int32(0), T0, jnp.asarray(jnp.inf, Xf.dtype),
            jnp.asarray(False), jnp.asarray(True))
    _, T_CkCf, _, _, ok = jax.lax.while_loop(cond, body, init)
    T_WCf_new = lie.sim3_mul(T_WCk, T_CkCf)
    return T_WCf_new, T_CkCf, ok


@partial(
    jax.jit,
    static_argnames=("cfg", "img_size", "optimize_focal", "covariance_filter"),
)
def opt_pose_calib_sim3(
    Xf: jax.Array,       # (N, 3) matched frame points (keyframe pixel order)
    Xf_cov: jax.Array,   # (N, 3) diag covariances of Xf
    Xk: jax.Array,       # (N, 3) keyframe points
    T_WCf: jax.Array,
    T_WCk: jax.Array,
    Qk: jax.Array,       # (N, 1)
    valid: jax.Array,    # (N, 1)
    meas_k: jax.Array,   # (N, 3) [u, v, log z]
    valid_meas_k: jax.Array,  # (N, 1)
    idx_f2k: jax.Array,  # (N,) frame pixel index per keyframe pixel
    K: jax.Array,        # (3, 3)
    img_size: tuple,
    cfg: TrackingConfig = TrackingConfig(),
    optimize_focal: bool = False,
    covariance_filter: bool = False,
):
    """Calibrated tracking: pixel + log-depth residuals (reference :296-396).

    Returns (T_WCf, T_CkCf, K, ok).  Traced under f32 matmul precision (see
    opt_pose_ray_dist_sim3).
    """
    with jax.default_matmul_precision("highest"):
        return _opt_pose_calib_sim3_body(
            Xf, Xf_cov, Xk, T_WCf, T_WCk, Qk, valid, meas_k, valid_meas_k,
            idx_f2k, K, img_size, cfg, optimize_focal, covariance_filter,
        )


def _opt_pose_calib_sim3_body(
    Xf, Xf_cov, Xk, T_WCf, T_WCk, Qk, valid, meas_k, valid_meas_k,
    idx_f2k, K, img_size, cfg, optimize_focal, covariance_filter,
):
    h, w = img_size
    dtype = Xf.dtype
    sqrt_q = jnp.sqrt(Qk)
    v = valid.astype(dtype)
    si_pix = (1.0 / cfg.sigma_pixel) * v * sqrt_q
    si_dep = (1.0 / cfg.sigma_depth) * v * sqrt_q
    sqrt_info = jnp.concatenate([jnp.repeat(si_pix, 2, -1), si_dep], axis=1)

    T0 = lie.sim3_mul(lie.sim3_inv(T_WCk), T_WCf)
    mdim = 8 if optimize_focal else 7

    def cond(c):
        step, T, K_c, old_cost, done, ok = c
        return (step < cfg.max_iters) & (~done) & ok

    def body(c):
        step, T, K_c, old_cost, done, ok = c

        if optimize_focal:
            u = (idx_f2k % w).astype(dtype)
            vv = (idx_f2k // w).astype(dtype)
            uv = jnp.stack([u, vv], axis=-1)
            fx, fy, cx, cy = proj.decompose_K(K_c)
            dXox = -(uv[..., 0] - cx) / (fx * fx) * Xf[..., 2]
            dXoy = -(uv[..., 1] - cy) / (fy * fy) * Xf[..., 2]
            dXf_df = jnp.stack(
                [dXox, dXoy, jnp.zeros_like(dXoy)], axis=-1
            )[..., None]  # (N,3,1)
            Xf_c = proj.backproject(uv, Xf[..., 2:3], K_c)
        else:
            dXf_df = jnp.zeros(Xf.shape[:-1] + (3, 1), dtype)
            Xf_c = Xf

        Xf_Ck, dX_dT = lie.sim3_act_jac(T, Xf_c)
        sR = lie.quat_to_matrix(T[3:7]) * T[7]
        dP_df = sR @ dXf_df if optimize_focal else None

        pz, dpz_dP, valid_proj = proj.project_calib(
            Xf_Ck,
            K_c,
            img_size,
            jacobian=True,
            border=cfg.pixel_border,
            z_eps=cfg.depth_eps,
            dP_df=dP_df,
        )

        if covariance_filter:
            # reference :335-346: project per-point covariance, gate on det
            cov_w = (sR[None] * Xf_cov[:, None, :]) @ jnp.swapaxes(
                jnp.broadcast_to(sR, Xf_cov.shape[:1] + (3, 3)), -1, -2
            )
            fx, fy, _, _ = proj.decompose_K(K_c)
            X_, Y_, Z_ = Xf_Ck[..., 0], Xf_Ck[..., 1], Xf_Ck[..., 2]
            Zs = jnp.where(jnp.abs(Z_) > 1e-12, Z_, 1e-12)
            o = jnp.zeros_like(X_)
            JC = jnp.stack(
                [fx / Zs, o, -fx * X_ / (Zs * Zs),
                 o, fy / Zs, -fy * Y_ / (Zs * Zs),
                 o, o, 1.0 / Zs],
                axis=-1,
            ).reshape(-1, 3, 3)
            pix_cov = JC @ cov_w @ jnp.swapaxes(JC, -1, -2)
            det = jnp.linalg.det(pix_cov)
            thresh = jnp.maximum(
                masked_quantile(det, jnp.ones_like(det, bool), 0.9), 1.0
            )
            valid_cov = (det < thresh)[..., None]
        else:
            valid_cov = jnp.ones_like(valid_meas_k)

        valid2 = valid_proj & valid_meas_k & valid_cov
        sqrt_info2 = valid2.astype(dtype) * sqrt_info

        r = meas_k - pz
        J = -dpz_dP[..., :3] @ dX_dT  # (N, 3, 7)
        if optimize_focal:
            J = jnp.concatenate([J, -dpz_dP[..., 3:]], axis=-1)

        tau, new_cost, ok_i = _solve_gn(sqrt_info2, r, J, cfg.huber)
        T = lie.sim3_normalize(lie.sim3_retr(T, tau[:7]))
        if optimize_focal:
            K_c = K_c.at[0, 0].add(tau[7]).at[1, 1].add(tau[7])

        done = robust.check_convergence(
            cfg.rel_error, cfg.delta_norm, old_cost, new_cost, tau[:7]
        )
        return step + 1, T, K_c, new_cost, done, ok & ok_i

    init = (jnp.int32(0), T0, K, jnp.asarray(jnp.inf, dtype),
            jnp.asarray(False), jnp.asarray(True))
    _, T_CkCf, K_out, _, _, ok = jax.lax.while_loop(cond, body, init)
    T_WCf_new = lie.sim3_mul(T_WCk, T_CkCf)
    return T_WCf_new, T_CkCf, K_out, ok


# ---------------------------------------------------------------------------
# Fused per-frame tracking step
# ---------------------------------------------------------------------------

@partial(
    jax.jit,
    static_argnames=("cfg", "img_size", "optimize_focal", "covariance_filter",
                     "thres_keyframe"),
)
def track_step(
    Xff: jax.Array,       # (HW, 3) new frame pointmap observation
    Cff: jax.Array,       # (HW, 1)
    fX: jax.Array,        # (HW, 3) frame fused pointmap state
    fC: jax.Array,        # (HW, 1)
    fN: jax.Array,        # () int32
    Xkf: jax.Array,       # (HW, 3) cross-predicted keyframe points (frame view)
    Ckf: jax.Array,       # (HW, 1)
    kX: jax.Array,        # (HW, 3) keyframe fused pointmap state
    kC: jax.Array,        # (HW, 1)
    kN: jax.Array,        # () int32
    idx_f2k: jax.Array,   # (HW,)
    vmk: jax.Array,       # (HW, 1) bool
    Qff: jax.Array,       # (HW, 1) frame desc-conf
    Qkf: jax.Array,       # (HW, 1) keyframe-side desc-conf
    T_WCf: jax.Array,     # (8,)
    T_WCk: jax.Array,     # (8,)
    K: jax.Array,
    last_dist: jax.Array,  # ()
    min_displacement: float,
    img_size: tuple,
    cfg: TrackingConfig,
    thres_keyframe: float = 0.8,
    optimize_focal: bool = False,
    covariance_filter: bool = False,
):
    """The whole post-matching tracking step as ONE device computation
    (reference CameraTracker.track:53-157 runs this as ~6 separate GPU
    stages with host branches between them).  Fusing it means a single
    dispatch and a single 5-scalar host pull per frame — on a tunneled
    device each separate host sync costs ~25 ms.

    Returns (fX', fC', fN', T_WCf', T_CkCf, K', kX', kC', kN',
    flags (5,) f32 = [match_frac, ok, is_kf, is_kf_map, dist_q]).
    """
    # accept the matcher's (1, HW[, 1]) batch layout directly — host-side
    # [0] slices are eager dispatches (~9 ms each per tracked frame)
    idx_f2k = idx_f2k.reshape(-1)
    vmk = vmk.reshape(-1, 1)
    # frame pointmap fusion (Frame.update_pointmap semantics)
    first = fN == 0
    denom = jnp.where(first, 1.0, fC + Cff)
    fX2 = jnp.where(first, Xff, (fC * fX + Cff * Xff)
                    / jnp.maximum(denom, 1e-12))
    fC2 = jnp.where(first, Cff, fC + Cff)
    fN2 = fN + 1
    favg = fC2 / jnp.maximum(fN2, 1).astype(fC2.dtype)
    kavg = kC / jnp.maximum(kN, 1).astype(kC.dtype)

    Qk = jnp.sqrt(Qff[idx_f2k] * Qkf)
    (Xf_m, Xf_cov, Xk_m, _Xk_cov, Cf_m, Ck_m, meas_k, valid_meas_k) = (
        prep_track_measurements(
            fX2, kX, favg, kavg, idx_f2k, K, img_size,
            depth_eps=cfg.depth_eps,
        )
    )
    valid_opt = vmk & (Cf_m > cfg.C_conf) & (Ck_m > cfg.C_conf) \
        & (Qk > cfg.Q_conf)
    valid_kf = vmk & (Qk > cfg.Q_conf)
    match_frac = jnp.mean(valid_opt.astype(jnp.float32))

    s = max(1, int(cfg.point_stride))
    T_WCf2, T_CkCf, K2, ok = opt_pose_calib_sim3(
        Xf_m[::s], Xf_cov[::s], Xk_m[::s], T_WCf, T_WCk, Qk[::s],
        valid_opt[::s], meas_k[::s], valid_meas_k[::s], idx_f2k[::s],
        K, img_size, cfg,
        optimize_focal=optimize_focal,
        covariance_filter=covariance_filter,
    )
    T_WCf2 = lie.sim3_normalize(T_WCf2)

    # keyframe point fusion (CameraTracker.py:136-141)
    Xkk = lie.sim3_act(T_CkCf, Xkf)
    kfirst = kN == 0
    kdenom = jnp.where(kfirst, 1.0, kC + Ckf)
    kX2 = jnp.where(kfirst, Xkk, (kC * kX + Ckf * Xkk)
                    / jnp.maximum(kdenom, 1e-12))
    kC2 = jnp.where(kfirst, Ckf, kC + Ckf)
    kN2 = kN + 1

    is_kf = check_keyframe(
        idx_f2k, valid_kf[:, 0], vmk, cfg.match_frac_thresh
    )
    h, w = img_size
    is_km, dq = check_keyframe_map(
        idx_f2k, valid_opt, w, h, thres_keyframe, last_dist,
        min_displacement,
    )
    flags = jnp.stack([
        match_frac,
        ok.astype(jnp.float32),
        is_kf.astype(jnp.float32),
        is_km.astype(jnp.float32),
        dq.astype(jnp.float32),
    ])
    return fX2, fC2, fN2, T_WCf2, T_CkCf, K2, kX2, kC2, kN2, flags


# ---------------------------------------------------------------------------
# Measurement prep + keyframe decisions
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("img_size", "depth_eps"))
def prep_track_measurements(
    Xf_canon: jax.Array,  # (N, 3) frame pointmap
    Xk_canon: jax.Array,  # (N, 3) keyframe pointmap
    Cf: jax.Array,        # (N, 1) frame average conf
    Ck: jax.Array,        # (N, 1) keyframe average conf
    idx_f2k: jax.Array,   # (N,)
    K: jax.Array,
    img_size: tuple,
    depth_eps: float = 1e-6,
):
    """get_points_poses equivalent (CameraTracker.py:189-219)."""
    h, w = img_size
    Xf = proj.constrain_points_to_ray(img_size, Xf_canon, K)
    Xk = proj.constrain_points_to_ray(img_size, Xk_canon, K)
    Xf_cov = local_diag_cov(Xf, h, w)
    Xk_cov = local_diag_cov(Xk, h, w)

    uv_k = proj.get_pixel_coords(img_size, dtype=Xf.dtype)
    valid_meas_k = Xk[..., 2:3] > depth_eps
    z_safe = jnp.where(valid_meas_k, Xk[..., 2:3], 1.0)
    meas_k = jnp.concatenate([uv_k, jnp.log(z_safe)], axis=-1)
    meas_k = jnp.where(valid_meas_k, meas_k, 0.0)

    return (
        Xf[idx_f2k],
        Xf_cov[idx_f2k],
        Xk,
        Xk_cov,
        Cf[idx_f2k],
        Ck,
        meas_k,
        valid_meas_k,
    )


@jax.jit
def check_keyframe(
    idx_f2k: jax.Array, valid_kf: jax.Array, valid_match_k: jax.Array,
    match_frac_thresh: float,
):
    """New-keyframe test (CameraTracker.py:159-167): min of keyframe match
    fraction and unique-frame-pixel fraction below threshold."""
    n = valid_kf.shape[0]
    match_frac_k = jnp.sum(valid_kf) / n
    # |unique(idx_f2k[valid])| via scatter-or
    hit = jnp.zeros((n,), bool).at[
        jnp.where(valid_match_k[:, 0], idx_f2k, 0)
    ].max(valid_match_k[:, 0])
    unique_frac_f = jnp.sum(hit) / n
    return jnp.minimum(match_frac_k, unique_frac_f) < match_frac_thresh


@partial(jax.jit, static_argnames=("W", "H", "q"))
def check_keyframe_map(
    idx_f2k: jax.Array, valid_opt: jax.Array, W: int, H: int,
    q: float, last_dist: jax.Array, min_displacement: float,
):
    """Mapper-frame test (CameraTracker.py:170-186): quantile of pixel
    displacement between matched and source pixels."""
    uf = (idx_f2k % W).astype(jnp.float32)
    vf = (idx_f2k // W).astype(jnp.float32)
    uv = proj.get_pixel_coords((H, W))
    dist = jnp.sqrt((uf - uv[:, 0]) ** 2 + (vf - uv[:, 1]) ** 2)
    dq = masked_quantile(dist, valid_opt[:, 0], q)
    return (dq - last_dist) > min_displacement, dq
