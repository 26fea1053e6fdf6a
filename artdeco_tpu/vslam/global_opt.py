"""Factor graph + global Sim(3) Gauss-Newton pose optimization.

Reference: ``VSLAM/mast3r_slam/global_opt.py:11-231`` (FactorGraph) and the
native solver ``VSLAM/backend/src/gn_kernels.cu:1231-1637``
(calib_proj_kernel + gauss_newton_calib driver + SparseBlock Eigen solve).

TPU redesign: the per-edge CUDA block accumulating a 14x14 upper-triangular
Hessian over H*W points becomes a batched einsum over a chunked ``lax.scan``
(bounded VMEM); the CPU double-precision sparse Cholesky roundtrip becomes an
on-device dense f32 Cholesky with Tikhonov jitter — pose counts are bounded
(<=2048 keyframes) so dense beats the reference's device->host->device sync
every iteration (SURVEY.md §7 "GN solver numerics").

Edge storage is padded to power-of-two capacities so the jitted solver
recompiles only on capacity growth.
"""

from __future__ import annotations

import dataclasses
import functools
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from artdeco_tpu.geometry import lie


# ---------------------------------------------------------------------------
# Jitted GN solver
# ---------------------------------------------------------------------------

def _clamp_step(dx, max_step: float = 1.0):
    """Per-pose trust region: cap each pose's tangent step norm.  A raw GN
    step on a badly-initialized graph can reach |dx| ~ 10, which blows up
    the Sim(3) retraction (scale = e^sigma); steps below the cap pass
    through unchanged so converged behavior is identical to plain GN."""
    nrm = jnp.linalg.norm(dx, axis=-1, keepdims=True)
    return dx * jnp.minimum(1.0, max_step / jnp.maximum(nrm, 1e-12))


def _edge_static(Xs, Cs, i_idx, j_idx, idx_ii2jj, valid_match, Q,
                 z_eps, sigma_pixel, sigma_depth, C_thresh, Q_thresh,
                 edge_valid, point_stride=1):
    """Iteration-invariant per-edge data (hoisted out of the GN loop).

    The measured-point gather ``Xs[i][idx]`` is the expensive op on TPU
    (147k-row random gather per edge); it does not depend on the pose
    iterate, so it is done ONCE per solve instead of once per GN iteration
    (~10x less gather traffic).  Only the z-component of the gathered point
    is ever used (log-depth residual), so only z is gathered.

    Returns (zi_log, sqrt_w_pix, sqrt_w_dep) each (HW,), with the weights
    already zeroed wherever the static validity gate fails.
    """
    ind = jnp.where(valid_match, idx_ii2jj, 0)
    zi = Xs[i_idx][:, 2][ind]    # (HW,) measured z in frame i
    q = Q[:, 0]
    ci = Cs[i_idx][ind, 0]
    cj = Cs[j_idx][::point_stride, 0]
    valid_zi = zi > z_eps
    valid = (
        valid_match & (q > Q_thresh) & (ci > C_thresh) & (cj > C_thresh)
        & valid_zi & edge_valid
    )
    zi_log = jnp.where(valid_zi, jnp.log(jnp.where(valid_zi, zi, 1.0)), 0.0)
    sqrt_w_pix = jnp.where(valid, (1.0 / sigma_pixel) * jnp.sqrt(q), 0.0)
    sqrt_w_dep = jnp.where(valid, (1.0 / sigma_depth) * jnp.sqrt(q), 0.0)
    return zi_log, sqrt_w_pix, sqrt_w_dep


def _edge_terms(T_wc, Xs, K, i_idx, j_idx, idx_ii2jj, zi_log,
                sqrt_w_pix0, sqrt_w_dep0, height, width, pixel_border,
                z_eps, point_stride=1):
    """Hessian blocks + gradients for ONE edge (calib_proj_kernel math).

    Static gating/weights come pre-reduced from :func:`_edge_static`; this
    per-iteration body touches only pose-dependent quantities.

    Returns (Hjj (7,7), gi, gj (7,)) — Hii == Hjj, Hij = Hji = -Hjj.
    """
    Ti = T_wc[i_idx]
    Tj = T_wc[j_idx]
    Tij = lie.sim3_rel(Ti, Tj)

    ind = idx_ii2jj
    Xj = Xs[j_idx][::point_stride]   # (HW/stride, 3)
    Xj_Ci = lie.sim3_act(Tij, Xj)

    fx, fy = K[0, 0], K[1, 1]
    cx, cy = K[0, 2], K[1, 2]

    valid_z = Xj_Ci[:, 2] > z_eps
    zj = jnp.where(valid_z, Xj_Ci[:, 2], 1.0)
    zj_inv = jnp.where(valid_z, 1.0 / zj, 0.0)
    zj_log = jnp.where(valid_z, jnp.log(zj), 0.0)

    x_div_z = Xj_Ci[:, 0] * zj_inv
    y_div_z = Xj_Ci[:, 1] * zj_inv
    u = fx * x_div_z + cx
    v = fy * y_div_z + cy

    u_t = (ind % width).astype(jnp.float32)
    v_t = (ind // width).astype(jnp.float32)

    valid_u = (u > pixel_border) & (u < width - 1 - pixel_border)
    valid_v = (v > pixel_border) & (v < height - 1 - pixel_border)

    err = jnp.stack([u - u_t, v - v_t, zj_log - zi_log], axis=-1)  # (HW, 3)

    gate = valid_u & valid_v & valid_z
    sqrt_w_pix = jnp.where(gate, sqrt_w_pix0, 0.0)
    sqrt_w_dep = jnp.where(gate, sqrt_w_dep0, 0.0)

    def huber(r):
        r_abs = jnp.abs(r)
        return jnp.where(r_abs < 1.345, 1.0, 1.345 / jnp.maximum(r_abs, 1e-12))

    w = jnp.stack(
        [
            huber(sqrt_w_pix * err[:, 0]) * sqrt_w_pix * sqrt_w_pix,
            huber(sqrt_w_pix * err[:, 1]) * sqrt_w_pix * sqrt_w_pix,
            huber(sqrt_w_dep * err[:, 2]) * sqrt_w_dep * sqrt_w_dep,
        ],
        axis=-1,
    )  # (HW, 3)

    zeros = jnp.zeros_like(x_div_z)
    ones = jnp.ones_like(x_div_z)
    # local (frame-i) 7-dim generator Jacobians per residual row
    J_u = jnp.stack(
        [fx * zj_inv, zeros, -fx * x_div_z * zj_inv,
         -fx * x_div_z * y_div_z, fx * (1 + x_div_z * x_div_z),
         -fx * y_div_z, zeros], axis=-1,
    )
    J_v = jnp.stack(
        [zeros, fy * zj_inv, -fy * y_div_z * zj_inv,
         -fy * (1 + y_div_z * y_div_z), fy * x_div_z * y_div_z,
         fy * x_div_z, zeros], axis=-1,
    )
    J_z = jnp.stack(
        [zeros, zeros, zj_inv, y_div_z, -x_div_z, zeros, ones], axis=-1,
    )
    J_loc = jnp.stack([J_u, J_v, J_z], axis=1)  # (HW, 3, 7)
    # world-frame tangent of pose j via Adj_i^{-T}; pose i gets the negative
    Jj = lie.sim3_adj_inv_transpose_apply(Ti, J_loc)  # broadcasts (HW,3,7)
    Ji = -Jj

    # accumulate H = J^T W J over points and residual rows (MXU einsums)
    wJj = w[..., None] * Jj
    Hjj = jnp.einsum("nrc,nrd->cd", wJj, Jj)
    gj = jnp.einsum("nr,nrc->c", w * err, Jj)
    gi = -gj
    return Hjj, gi, gj


def _gn_calib_impl(
    T_wc: jax.Array,        # (P, 8) Sim3 poses (padded; first num_fix fixed)
    Xs: jax.Array,          # (P, HW, 3) pointmaps (ray-constrained)
    Cs: jax.Array,          # (P, HW, 1) average confidences
    K: jax.Array,           # (3, 3)
    ii: jax.Array,          # (E,) int32 edge source (pose index)
    jj: jax.Array,          # (E,) int32 edge target
    idx_ii2jj: jax.Array,   # (E, HW) int32
    valid_match: jax.Array,  # (E, HW) bool
    Q: jax.Array,           # (E, HW, 1)
    edge_valid: jax.Array,  # (E,) bool — padding edges contribute nothing
    pose_used: jax.Array,   # (P,) bool — padding poses pinned
    height: int,
    width: int,
    pixel_border: int = -10,
    z_eps: float = 1e-6,
    sigma_pixel: float = 1.0,
    sigma_depth: float = 10.0,
    C_thresh: float = 0.0,
    Q_thresh: float = 1.5,
    max_iter: int = 10,
    delta_thresh: float = 1e-8,
    num_fix: int = 1,
    chunk: int = 64,
    point_stride: int = 1,
    axis_name=None,
):
    """Global Sim(3) pose-graph GN (gauss_newton_calib_cuda semantics).

    ``point_stride`` subsamples the per-edge residual set (every stride-th
    target pixel).  The reference uses every pixel (~147k residuals/edge),
    which over-determines a 7-DoF pose by 4 orders of magnitude; striding
    cuts HBM traffic proportionally with negligible estimator variance.

    ``axis_name``: when running under shard_map with edges sharded over a
    mesh axis (gauss_newton_calib_sharded), each shard accumulates (H, g)
    over its local edges and ONE psum per GN iteration merges them; every
    device then solves the (small, replicated) dense system identically.

    Returns updated poses (P, 8).
    """
    P = T_wc.shape[0]
    E = ii.shape[0]
    D = 7
    # large chunks keep the per-iteration edge scan SHORT: at the old
    # chunk=8, E=64 the solver ran 8 sequential scan bodies per GN iteration
    # (80 per solve), each paying ~4-5 ms of gather/control-flow latency —
    # measured 329 ms/solve at 34 edges; chunk=64 makes it 1 body/iteration.
    # chunk must divide E (the scan covers E//chunk slices): clamp to the
    # largest divisor of E not above the requested chunk (E is a power of
    # two in production, so this is just min(chunk, E) there); E == 0 (a
    # direct/test call with no edges) degenerates to chunk=1, zero slices
    chunk = max(1, min(chunk, E))
    while E % chunk:
        chunk -= 1
    if point_stride > 1:
        idx_ii2jj = idx_ii2jj[:, ::point_stride]
        valid_match = valid_match[:, ::point_stride]
        Q = Q[:, ::point_stride]

    free = pose_used & (jnp.arange(P) >= num_fix)  # optimizable poses

    # iteration-invariant per-edge stats (the expensive gathers), chunked
    def static_chunk(_, c):
        sl = lambda a: jax.lax.dynamic_slice_in_dim(a, c * chunk, chunk, 0)
        out = jax.vmap(
            lambda a, b, cdx, d, e, f: _edge_static(
                Xs, Cs, a, b, cdx, d, e, z_eps, sigma_pixel, sigma_depth,
                C_thresh, Q_thresh, edge_valid=f,
                point_stride=point_stride,
            )
        )(sl(ii), sl(jj), sl(idx_ii2jj), sl(valid_match), sl(Q),
          sl(edge_valid))
        return None, out

    _, (zi_log_all, swp_all, swd_all) = jax.lax.scan(
        static_chunk, None, jnp.arange(E // chunk)
    )
    zi_log_all = zi_log_all.reshape(E, -1)
    swp_all = swp_all.reshape(E, -1)
    swd_all = swd_all.reshape(E, -1)
    ind_all = jnp.where(valid_match, idx_ii2jj, 0)

    def one_iter(carry):
        it, T, dn = carry

        def edge_chunk(acc, c):
            Hacc, gacc = acc
            sl = lambda a: jax.lax.dynamic_slice_in_dim(a, c * chunk, chunk, 0)
            e_ii = sl(ii)
            e_jj = sl(jj)
            Hjj, gi, gj = jax.vmap(
                lambda a, b, cdx, zl, wp, wd: _edge_terms(
                    T, Xs, K, a, b, cdx, zl, wp, wd,
                    height, width, pixel_border, z_eps,
                    point_stride=point_stride,
                )
            )(e_ii, e_jj, sl(ind_all), sl(zi_log_all), sl(swp_all),
              sl(swd_all))
            # scatter-add into the dense (P, P, 7, 7) block matrix
            # (Hii == Hjj, Hij = Hji = -Hjj)
            Hacc = Hacc.at[e_ii, e_ii].add(Hjj)
            Hacc = Hacc.at[e_ii, e_jj].add(-Hjj)
            Hacc = Hacc.at[e_jj, e_ii].add(-Hjj)
            Hacc = Hacc.at[e_jj, e_jj].add(Hjj)
            gacc = gacc.at[e_ii].add(gi)
            gacc = gacc.at[e_jj].add(gj)
            return (Hacc, gacc), None

        H0 = jnp.zeros((P, P, D, D))
        g0 = jnp.zeros((P, D))
        (H, g), _ = jax.lax.scan(
            edge_chunk, (H0, g0), jnp.arange(E // chunk)
        )
        if axis_name is not None:
            # edge-sharded: merge the per-shard partial normal equations
            H = jax.lax.psum(H, axis_name)
            g = jax.lax.psum(g, axis_name)

        # dense assembly; pin fixed/unused poses by identity rows
        Hd = H.transpose(0, 2, 1, 3).reshape(P * D, P * D)
        gd = g.reshape(P * D)
        pin = jnp.repeat(~free, D)
        # exact free-subspace restriction (identical semantics to the PCG
        # solver): zero pinned rows/cols AND gradient, identity diagonal
        Hd = jnp.where(pin[:, None] | pin[None, :], 0.0, Hd)
        Hd = Hd + jnp.diag(jnp.where(pin, 1.0, 1e-6))  # jitter + pinning
        gd = jnp.where(pin, 0.0, gd)
        dx = -jnp.linalg.solve(Hd, gd)
        dx = jnp.where(pin, 0.0, dx).reshape(P, D)
        dx = _clamp_step(dx)

        T_new = lie.sim3_normalize(lie.sim3_retr(T, dx))
        T = jnp.where(free[:, None], T_new, T)
        return it + 1, T, jnp.linalg.norm(dx)

    def cond(carry):
        it, T, dn = carry
        return (it < max_iter) & (dn >= delta_thresh)

    _, T_out, _ = jax.lax.while_loop(
        cond, one_iter, (jnp.int32(0), T_wc, jnp.asarray(jnp.inf))
    )
    return T_out


gauss_newton_calib = partial(
    jax.jit,
    static_argnames=("height", "width", "max_iter", "num_fix", "chunk",
                     "point_stride"),
)(_gn_calib_impl)


def gauss_newton_calib_sharded(mesh, axis: str, *args, **kwargs):
    """Edge-sharded global GN over a device mesh (SURVEY §2.4).

    The reference assigns one CUDA block per edge within one GPU
    (``gn_kernels.cu:1231-1637``); here edges shard across devices: each
    device computes per-edge statics and (H, g) partial sums for its local
    edge slice, ONE ``psum`` per GN iteration merges the normal equations
    over ICI, and the small dense solve replicates on every device (P <=
    256, so the redundant solve is cheaper than gathering).  The edge count
    E must be divisible by the mesh axis size (callers pad E to a power of
    two >= 64).  Identical solution to the single-device solver.
    """
    from jax.sharding import PartitionSpec

    ndev = mesh.shape[axis]
    e = PartitionSpec(axis)
    r = PartitionSpec()
    # first 11 positionals are arrays: T_wc Xs Cs K replicated; ii jj idx vm
    # Q edge_valid sharded over edges; pose_used replicated.  Any further
    # positionals (height, width, ...) are statics — bake them into kwargs.
    arrays, statics = args[:11], args[11:]
    for name, v in zip(("height", "width", "pixel_border", "z_eps",
                        "sigma_pixel", "sigma_depth", "C_thresh", "Q_thresh",
                        "max_iter", "delta_thresh", "num_fix", "chunk",
                        "point_stride"), statics):
        kwargs[name] = v
    in_specs = (r, r, r, r, e, e, e, e, e, e, r)
    E = arrays[4].shape[0]
    if E % ndev:
        raise ValueError(f"edge pad {E} not divisible by mesh axis {ndev}")
    # local chunk: cover the whole local slice in one scan body by default
    kwargs.setdefault("chunk", max(1, E // ndev))
    fn = _sharded_gn_fn(mesh, axis, tuple(sorted(kwargs.items())))
    return fn(*arrays)


@functools.lru_cache(maxsize=32)
def _sharded_gn_fn(mesh, axis: str, kw_items: tuple):
    """One jitted shard_map per (mesh, axis, statics) — rebuilding it per
    call would re-trace/re-compile every solve."""
    from jax.sharding import PartitionSpec

    e = PartitionSpec(axis)
    r = PartitionSpec()
    fn = partial(_gn_calib_impl, axis_name=axis, **dict(kw_items))
    return jax.jit(jax.shard_map(
        fn, mesh=mesh, in_specs=(r, r, r, r, e, e, e, e, e, e, r),
        out_specs=r, check_vma=False,
    ))


@partial(
    jax.jit,
    static_argnames=("height", "width", "max_iter", "num_fix", "chunk",
                     "pcg_iters", "point_stride"),
)
def gauss_newton_calib_sparse(
    T_wc: jax.Array,        # (P, 8) Sim3 poses (padded; first num_fix fixed)
    Xs: jax.Array,          # (P, HW, 3)
    Cs: jax.Array,          # (P, HW, 1)
    K: jax.Array,           # (3, 3)
    ii: jax.Array,          # (E,)
    jj: jax.Array,          # (E,)
    idx_ii2jj: jax.Array,   # (E, HW)
    valid_match: jax.Array,  # (E, HW)
    Q: jax.Array,           # (E, HW, 1)
    edge_valid: jax.Array,  # (E,)
    pose_used: jax.Array,   # (P,)
    height: int,
    width: int,
    pixel_border: int = -10,
    z_eps: float = 1e-6,
    sigma_pixel: float = 1.0,
    sigma_depth: float = 10.0,
    C_thresh: float = 0.0,
    Q_thresh: float = 1.5,
    max_iter: int = 10,
    delta_thresh: float = 1e-8,
    num_fix: int = 1,
    chunk: int = 64,
    pcg_iters: int = None,
    point_stride: int = 1,
):
    """Block-sparse Gauss-Newton for large pose counts.

    The reference solves the same edge-sparse normal equations with an Eigen
    SimplicialLLT on the host (``gn_kernels.cu:57-159``, a device->host
    roundtrip per GN iteration).  Here the special structure of the
    pose-graph Hessian (per edge, Hii = Hjj = -Hij = -Hji =: B_e — a graph
    Laplacian of 7x7 blocks) lets the whole solve stay on device:

      * per-edge blocks B_e (E,7,7) + gradients (scatter-added to (P,7))
        replace the dense (P,P,7,7) accumulation — O(E) memory, not O(P^2);
      * the solve is preconditioned conjugate gradients with a block-Jacobi
        (7x7 per-pose) preconditioner; the matvec is two gathers + one
        batched 7x7 matmul + two scatter-adds over edges.

    Identical semantics to ``gauss_newton_calib`` — used for P > ~256 where
    the dense assembly would not fit (822 MB at the 2048-keyframe bound).
    """
    P = T_wc.shape[0]
    E = ii.shape[0]
    D = 7
    # large chunks keep the per-iteration edge scan SHORT: at the old
    # chunk=8, E=64 the solver ran 8 sequential scan bodies per GN iteration
    # (80 per solve), each paying ~4-5 ms of gather/control-flow latency —
    # measured 329 ms/solve at 34 edges; chunk=64 makes it 1 body/iteration.
    # chunk must divide E (the scan covers E//chunk slices): clamp to the
    # largest divisor of E not above the requested chunk (E is a power of
    # two in production, so this is just min(chunk, E) there); E == 0 (a
    # direct/test call with no edges) degenerates to chunk=1, zero slices
    chunk = max(1, min(chunk, E))
    while E % chunk:
        chunk -= 1
    if point_stride > 1:
        idx_ii2jj = idx_ii2jj[:, ::point_stride]
        valid_match = valid_match[:, ::point_stride]
        Q = Q[:, ::point_stride]
    if pcg_iters is None:
        # CG on a chain-like pose graph needs ~O(P) iterations to carry
        # corrections across the graph diameter (block-Jacobi does not
        # shorten the path); matvecs are O(E*49) so this stays cheap
        pcg_iters = max(128, 2 * P)

    free = pose_used & (jnp.arange(P) >= num_fix)
    ev_f = edge_valid.astype(jnp.float32)[:, None]

    # iteration-invariant per-edge stats (the expensive gathers), chunked
    def static_chunk(_, c):
        sl = lambda a: jax.lax.dynamic_slice_in_dim(a, c * chunk, chunk, 0)
        out = jax.vmap(
            lambda a, b, cdx, d, e, f: _edge_static(
                Xs, Cs, a, b, cdx, d, e, z_eps, sigma_pixel, sigma_depth,
                C_thresh, Q_thresh, edge_valid=f,
                point_stride=point_stride,
            )
        )(sl(ii), sl(jj), sl(idx_ii2jj), sl(valid_match), sl(Q),
          sl(edge_valid))
        return None, out

    _, (zi_log_all, swp_all, swd_all) = jax.lax.scan(
        static_chunk, None, jnp.arange(E // chunk)
    )
    zi_log_all = zi_log_all.reshape(E, -1)
    swp_all = swp_all.reshape(E, -1)
    swd_all = swd_all.reshape(E, -1)
    ind_all = jnp.where(valid_match, idx_ii2jj, 0)

    def one_iter(carry):
        it, T, dn = carry

        def edge_chunk(gacc, c):
            sl = lambda a: jax.lax.dynamic_slice_in_dim(a, c * chunk, chunk, 0)
            e_ii, e_jj = sl(ii), sl(jj)
            Bc, gi, gj = jax.vmap(
                lambda a, b, cdx, zl, wp, wd: _edge_terms(
                    T, Xs, K, a, b, cdx, zl, wp, wd,
                    height, width, pixel_border, z_eps,
                    point_stride=point_stride,
                )
            )(e_ii, e_jj, sl(ind_all), sl(zi_log_all), sl(swp_all),
              sl(swd_all))
            gacc = gacc.at[e_ii].add(gi)
            gacc = gacc.at[e_jj].add(gj)
            return gacc, Bc

        g, B = jax.lax.scan(
            edge_chunk, jnp.zeros((P, D)), jnp.arange(E // chunk)
        )
        B = B.reshape(E, D, D) * ev_f[:, :, None]

        # block diagonal (P, 7, 7) + jitter; pinned poses get identity
        Hdiag = (
            jnp.zeros((P, D, D)).at[ii].add(B).at[jj].add(B)
            + 1e-6 * jnp.eye(D)
        )
        Hdiag = jnp.where(
            free[:, None, None], Hdiag, jnp.broadcast_to(jnp.eye(D), (P, D, D))
        )
        Minv = jnp.linalg.inv(Hdiag)

        maskx = free[:, None].astype(jnp.float32)

        def matvec(x):
            x = x * maskx
            t = jnp.einsum("ecd,ed->ec", B, x[ii] - x[jj])
            y = jnp.zeros_like(x).at[ii].add(t).at[jj].add(-t)
            return (y + 1e-6 * x) * maskx

        def precond(r):
            return jnp.einsum("pcd,pd->pc", Minv, r) * maskx

        # PCG: solve H dx = -g
        b = -g * maskx
        x0 = jnp.zeros((P, D))
        r0 = b
        z0 = precond(r0)
        p0 = z0
        rz0 = jnp.vdot(r0, z0)
        b_norm2 = jnp.maximum(jnp.vdot(b, b), 1e-30)

        def pcg_cond(s):
            k, x, r, z, p, rz = s
            return (k < pcg_iters) & (jnp.vdot(r, r) > 1e-12 * b_norm2)

        def pcg_step(s):
            k, x, r, z, p, rz = s
            Ap = matvec(p)
            alpha = rz / jnp.maximum(jnp.vdot(p, Ap), 1e-30)
            x = x + alpha * p
            r = r - alpha * Ap
            z = precond(r)
            rz_new = jnp.vdot(r, z)
            beta = rz_new / jnp.maximum(rz, 1e-30)
            p = z + beta * p
            return k + 1, x, r, z, p, rz_new

        _, dx, _, _, _, _ = jax.lax.while_loop(
            pcg_cond, pcg_step, (jnp.int32(0), x0, r0, z0, p0, rz0)
        )
        dx = _clamp_step(dx * maskx)

        T_new = lie.sim3_normalize(lie.sim3_retr(T, dx))
        T = jnp.where(free[:, None], T_new, T)
        return it + 1, T, jnp.linalg.norm(dx)

    def cond(carry):
        it, T, dn = carry
        return (it < max_iter) & (dn >= delta_thresh)

    _, T_out, _ = jax.lax.while_loop(
        cond, one_iter, (jnp.int32(0), T_wc, jnp.asarray(jnp.inf))
    )
    return T_out


@partial(jax.jit, static_argnames=("h", "w"))
def _gn_prep_jit(dev_X, dev_C, slot_of, used, K, h: int, w: int):
    """Solver input prep: gather pose pointmaps from the device mirror and
    ray-constrain them, as one program."""
    from artdeco_tpu.geometry import projection as proj

    Xs = proj.constrain_points_to_ray((h, w), dev_X[slot_of], K)
    Cs = jnp.where(used[:, None, None], dev_C[slot_of], -1.0)
    return Xs, Cs


# ---------------------------------------------------------------------------
# Host-side factor graph
# ---------------------------------------------------------------------------

class FactorGraph:
    """Edge store with two-way matching (reference global_opt.py:11-136).

    Host numpy arrays padded to power-of-two capacity for the jitted solver.
    """

    def __init__(self, cfg: dict, runner, keyframes, K, hw):
        self.cfg = cfg["local_opt"]
        self.runner = runner          # Mast3rRunner (match_symmetric)
        self.keyframes = keyframes    # KeyframeStore
        self.K = np.asarray(K, np.float32)
        self.h, self.w = hw
        self.ii: list[int] = []       # undirected pairs (bookkeeping)
        self.jj: list[int] = []
        # directed edge store: per-edge SCALAR metadata on host (each kept
        # pair occupies two rows, one per direction); the O(HW) payloads
        # (match index map, validity, Q) live ONLY on device — they are
        # produced there by the matching cascade and consumed there by the
        # solver, so any host copy would be a pure d2h+h2d roundtrip on the
        # per-keyframe critical path (~19 MB per keyframe over PCIe)
        self._cap = 16
        self.n_directed = 0
        self.e_ii = np.zeros(self._cap, np.int32)
        self.e_jj = np.zeros(self._cap, np.int32)
        self.e_valid = np.zeros(self._cap, bool)
        self._dev_edges: dict = {}          # 'idx','vm','q' (capE, HW) jnp
        self._dev_ecap = 0
        # per-keyframe pointmap mirror, device-resident + version-synced
        self._dev_X = None                  # (capP, HW, 3) jnp
        self._dev_C = None                  # (capP, HW, 1) jnp
        self._kf_slot: dict = {}            # keyframe id -> device slot
        self._slot_version: dict = {}       # keyframe id -> synced version
        self._dev_pcap = 0
        # background-compiled (P, E) solver variants (see _prewarm_solver)
        self._warmed: set = set()
        # optional device mesh: edges shard over this axis in solve_GN_calib
        # (gauss_newton_calib_sharded); set via enable_mesh when the runtime
        # runs multi-chip
        self.mesh = None
        self.mesh_axis = "dp"
        self.timers: dict = {}   # substage wall-clock [sum_s, n]
        # warm the ladder rungs a ~100-frame stream can reach up front: a
        # rung compiled on demand (or even in the background — the bench
        # host has ONE core, so a background compile steals it from the
        # tracking thread) lands ~10-30 s of stall on the keyframe that
        # crosses it.  runtime/prewarm.wait_all() drains these before
        # streaming starts.  TPU only: CPU tests construct many
        # FactorGraphs and compiles there are cheap on first use.
        import os as _os

        import jax as _jax

        if (_jax.default_backend() == "tpu"
                or _os.environ.get("ARTDECO_FORCE_PREWARM") == "1"):
            for rung in ((32, 64), (32, 128), (32, 256), (32, 512),
                         (64, 128), (64, 256), (64, 512)):
                self._prewarm_solver(*rung)
            self._prewarm_helpers()

    def _prewarm_helpers(self):
        """AOT-compile the factor-graph glue jits at their runtime buckets.

        profile_compiles.py (r5) showed ~12 of these compiling ON the
        per-keyframe critical path at 1-2 s each over the tunnel —
        add_factors' first use of each pad bucket cost 16-21 s of bkd-sync.
        Shapes must match the runtime avals exactly (incl. weak_type: a
        jnp.asarray(python_scalar) arg keys a DIFFERENT executable than a
        ShapeDtypeStruct — measured as a persistent-cache miss)."""
        import jax
        import jax.numpy as jnp

        from artdeco_tpu.runtime.prewarm import submit_compile

        sds = jax.ShapeDtypeStruct
        f32 = jnp.float32
        i32 = jnp.int32
        n = self.h * self.w
        ecap = 256      # _ensure_dev_capacity floor
        pcap = 64       # _sync_poses_device floor

        # force the lazy _scatter_jit into existence for lowering
        if not hasattr(FactorGraph, "_scatter_jit"):
            FactorGraph._scatter_jit = jax.jit(
                lambda a, i, v: a.at[i].set(v, mode="drop")
            )

        def low_scatter(dtype, rows):
            def low():
                return FactorGraph._scatter_jit.lower(
                    sds((ecap, n), dtype), sds((rows,), i32),
                    sds((rows, n), dtype),
                )
            return low

        def low_scatter_pose(shape_tail, rows):
            def low():
                return FactorGraph._scatter_jit.lower(
                    sds((pcap, n) + shape_tail, f32), sds((rows,), i32),
                    sds((rows, n) + shape_tail, f32),
                )
            return low

        def low_gather_pairs(b):
            def low():
                return FactorGraph._gather_pair_rows.lower(
                    sds((b, n), i32), sds((b, n), i32),
                    sds((b, n, 1), jnp.bool_), sds((b, n, 1), jnp.bool_),
                    sds((b, n), f32), sds((b, n), f32), sds((b,), i32),
                )
            return low

        def low_stack_stale(k):
            def low():
                return FactorGraph._stack_stale.lower(
                    tuple(sds((n, 3), f32) for _ in range(k)),
                    tuple(sds((n, 1), f32) for _ in range(k)),
                    tuple(sds((), i32) for _ in range(k)),
                )
            return low

        def low_gn_prep(P):
            def low():
                return _gn_prep_jit.lower(
                    sds((pcap, n, 3), f32), sds((pcap, n, 1), f32),
                    sds((P,), i32), sds((P,), jnp.bool_), sds((3, 3), f32),
                    self.h, self.w,
                )
            return low

        def low_slice_edges():
            return FactorGraph._slice_edges.lower(
                sds((ecap, n), i32), sds((ecap, n), jnp.bool_),
                sds((ecap, n), f32), 64,
            )

        jobs = []
        for b in (1, 2, 4):
            jobs.append((f"fg.gather_pairs[b={b}]", low_gather_pairs(b)))
            for dt, tag in ((i32, "i32"), (jnp.bool_, "bool"), (f32, "f32")):
                jobs.append(
                    (f"fg.scatter[{tag},rows={2 * b}]",
                     low_scatter(dt, 2 * b))
                )
        for k in (1, 2, 3):
            jobs.append((f"fg.stack_stale[{k}]", low_stack_stale(k)))
            jobs.append((f"fg.pose_scatter_X[{k}]",
                         low_scatter_pose((3,), k)))
            jobs.append((f"fg.pose_scatter_C[{k}]",
                         low_scatter_pose((1,), k)))
        for P in (32, 64):
            jobs.append((f"fg.gn_prep[P={P}]", low_gn_prep(P)))
        jobs.append(("fg.slice_edges[E=64]", low_slice_edges))
        for name, low in jobs:
            submit_compile(name, low, verbose=False)

    def enable_mesh(self, mesh, axis: str = "dp"):
        """Shard subsequent global GN solves over the mesh's ``axis``
        (edge-parallel; see gauss_newton_calib_sharded)."""
        self.mesh = mesh
        self.mesh_axis = axis

    def _t(self, key: str, t0: float):
        import time as _time

        acc = self.timers.setdefault(key, [0.0, 0])
        acc[0] += _time.perf_counter() - t0
        acc[1] += 1
        return _time.perf_counter()

    def __len__(self):
        return len(self.ii)

    def _ensure_capacity(self, add: int):
        need = self.n_directed + add
        if need <= self._cap:
            return
        new_cap = self._pow2(need, lo=self._cap * 2)

        def grow(a, shape, dtype):
            out = np.zeros(shape, dtype)
            out[: self.n_directed] = a[: self.n_directed]
            return out

        self.e_ii = grow(self.e_ii, (new_cap,), np.int32)
        self.e_jj = grow(self.e_jj, (new_cap,), np.int32)
        self.e_valid = grow(self.e_valid, (new_cap,), bool)
        self._cap = new_cap

    def _ensure_dev_capacity(self, need: int):
        import jax.numpy as jnp

        if need <= self._dev_ecap:
            return
        n = self.h * self.w
        # floor 256 directed edges (~680 MB at 512x288): growth re-allocates
        # the mirrors and recompiles every consumer at the new capE — BENCH
        # r4 showed 10 s keyframe stalls at each pow2 step; a generous floor
        # removes all growth below ~60 keyframes
        newcap = self._pow2(need, lo=max(256, self._dev_ecap * 2))
        old = self._dev_edges
        self._dev_edges = {
            "idx": jnp.zeros((newcap, n), jnp.int32),
            "vm": jnp.zeros((newcap, n), jnp.bool_),
            "q": jnp.zeros((newcap, n), jnp.float32),
        }
        if old:
            for k in self._dev_edges:
                self._dev_edges[k] = (
                    self._dev_edges[k].at[: self._dev_ecap].set(old[k])
                )
        self._dev_ecap = newcap

    def _append_directed(self, i, j, idx, vm, q):
        """Append one directed edge; payload rows may be host or device
        arrays (one-row scatter — used by tests and the reloc path)."""
        import jax.numpy as jnp

        self._ensure_capacity(1)
        self._ensure_dev_capacity(self.n_directed + 1)
        k = self.n_directed
        self.e_ii[k] = i
        self.e_jj[k] = j
        self.e_valid[k] = True
        rows = jnp.asarray([k])
        self._dev_edges["idx"] = self._scatter_rows(
            self._dev_edges["idx"], rows,
            jnp.asarray(idx, jnp.int32)[None])
        self._dev_edges["vm"] = self._scatter_rows(
            self._dev_edges["vm"], rows, jnp.asarray(vm, bool)[None])
        self._dev_edges["q"] = self._scatter_rows(
            self._dev_edges["q"], rows,
            jnp.asarray(q, jnp.float32)[None])
        self.n_directed += 1

    # -- device mirror -------------------------------------------------------
    @staticmethod
    def _scatter_rows(a, rows_idx, rows):
        """Row scatter on device.  Out-of-range indices drop (used to pad
        scatters to a fixed row count so the jit does not retrace per
        kept-edge count).

        NOT donated: donate_argnums=0 here deterministically corrupted
        backend state under warm async dispatch on the tunneled TPU backend
        (the r3/r4 'INVALID_ARGUMENT at the 2nd add_factors' crash — the
        donated buffer is re-aliased while a previously queued consumer is
        still in flight).  The copy is ~85 MB/keyframe of HBM traffic,
        ~0.1 ms on v5e — not worth the aliasing hazard."""
        import jax

        if not hasattr(FactorGraph, "_scatter_jit"):
            FactorGraph._scatter_jit = jax.jit(
                lambda a, i, v: a.at[i].set(v, mode="drop")
            )
        return FactorGraph._scatter_jit(a, rows_idx, rows)

    def _sync_poses_device(self, uniq):
        """Assign device slots to keyframes and (re)upload pointmaps whose
        host version changed since the last sync."""
        import jax.numpy as jnp

        n = self.h * self.w
        for k in uniq:
            self._kf_slot.setdefault(int(k), len(self._kf_slot))
        if len(self._kf_slot) > self._dev_pcap:
            newcap = self._pow2(len(self._kf_slot),
                                lo=max(64, self._dev_pcap * 2))
            X = jnp.zeros((newcap, n, 3), jnp.float32)
            C = jnp.zeros((newcap, n, 1), jnp.float32)
            if self._dev_X is not None:
                X = X.at[: self._dev_pcap].set(self._dev_X)
                C = C.at[: self._dev_pcap].set(self._dev_C)
            self._dev_X, self._dev_C, self._dev_pcap = X, C, newcap
        stale = [int(k) for k in uniq
                 if self._slot_version.get(int(k))
                 != int(self.keyframes.version[k])]
        if stale:
            # payloads are already device-resident in the store: stack +
            # scatter is a pure on-device move, no host hop; one jitted
            # dispatch per array (eager stacks/divides cost ~9 ms each)
            slots = jnp.asarray([self._kf_slot[k] for k in stale])
            Xrows, Crows = self._stack_stale(
                tuple(self.keyframes.X_dev(k) for k in stale),
                tuple(self.keyframes.C_dev(k) for k in stale),
                tuple(self.keyframes.N_dev(k) for k in stale),
            )
            self._dev_X = self._scatter_rows(self._dev_X, slots, Xrows)
            self._dev_C = self._scatter_rows(self._dev_C, slots, Crows)
            for k in stale:
                self._slot_version[k] = int(self.keyframes.version[k])

    @staticmethod
    @partial(jax.jit, static_argnames=("E",))
    def _slice_edges(idx, vm, q, E: int):
        """The three edge-payload prefix slices for the solver, fused into
        one dispatch (eager [:E] slices cost ~9 ms each)."""
        return idx[:E], vm[:E], q[:E][..., None]

    @staticmethod
    @jax.jit
    def _stack_stale(Xs: tuple, Cs: tuple, Ns: tuple):
        Xrows = jnp.stack(Xs)
        Crows = jnp.stack([
            C / jnp.maximum(N, 1).astype(jnp.float32)
            for C, N in zip(Cs, Ns)
        ])
        return Xrows, Crows

    @staticmethod
    @partial(jax.jit, static_argnames=("q_conf",))
    def _edge_post(idx_i2j, idx_j2i, vm_j, vm_i, Qii, Qjj, Qji, Qij,
                   q_conf: float):
        """Two-way match quality on device; only the per-edge fractions
        cross to the host (2*b floats instead of ~19 MB of payloads)."""
        Qj = jnp.sqrt(
            jnp.take_along_axis(Qii[..., 0], idx_i2j, axis=1) * Qji[..., 0]
        )
        Qi = jnp.sqrt(
            jnp.take_along_axis(Qjj[..., 0], idx_j2i, axis=1) * Qij[..., 0]
        )
        valid_j = vm_j[..., 0] & (Qj > q_conf)
        valid_i = vm_i[..., 0] & (Qi > q_conf)
        fracs = jnp.stack([valid_j.mean(axis=1), valid_i.mean(axis=1)])
        return Qj, Qi, fracs

    # symmetric-match batches are padded to pow2 bucket sizes so the
    # matching cascade (and, with the real model, the decoder) compiles once
    # per bucket instead of once per candidate count.  Most keyframes have
    # ONLY the consecutive candidate (retrieval returns nothing until loops
    # occur), so the common case runs a 2-cascade batch, not 8 (VERDICT r3
    # task 3: cut the padded cascades).
    MATCH_PAD_PAIRS = 4

    @staticmethod
    @jax.jit
    def _concat0(*xs):
        """Batch-concat as one jitted dispatch (cached per arg count —
        eager jnp.concatenate costs ~9 ms of blocking host RPC each)."""
        return jnp.concatenate(xs, axis=0)

    @staticmethod
    @jax.jit
    def _gather_pair_rows(idx_i2j, idx_j2i, vm_j, vm_i, Qj, Qi, kj):
        """Select kept pairs + stack both directions for the edge-store
        scatter, in ONE dispatch.  Rows [0, pad): i->j, [pad, 2*pad): j->i."""
        return (
            jnp.concatenate([idx_i2j[kj], idx_j2i[kj]], axis=0),
            jnp.concatenate([vm_j[kj, :, 0], vm_i[kj, :, 0]], axis=0),
            jnp.concatenate([Qj[kj], Qi[kj]], axis=0),
        )

    def add_factors(self, ii: list, jj: list, min_match_frac: float,
                    is_reloc: bool = False) -> bool:
        """Symmetric-match candidate edges; keep those with two-way match
        fraction above threshold (global_opt.py:40-113)."""
        if not ii:
            return False
        import time as _time

        import jax.numpy as jnp

        t0 = _time.perf_counter()
        n_real = len(ii)
        pad_to = 1
        while pad_to < n_real:
            pad_to *= 2
        ii = list(ii) + [ii[-1]] * (pad_to - n_real)
        jj = list(jj) + [jj[-1]] * (pad_to - n_real)

        feat_i = self._concat0(
            *[self.keyframes.get_embedding(i)[0] for i in ii]
        )
        pos_i = self._concat0(
            *[self.keyframes.get_embedding(i)[1] for i in ii]
        )
        feat_j = self._concat0(
            *[self.keyframes.get_embedding(j)[0] for j in jj]
        )
        pos_j = self._concat0(
            *[self.keyframes.get_embedding(j)[1] for j in jj]
        )
        (idx_i2j, idx_j2i, vm_j, vm_i, Qii, Qjj, Qji, Qij) = (
            self.runner.match_symmetric(feat_i, pos_i, feat_j, pos_j,
                                        (self.h, self.w))
        )
        t0 = self._t("fg.match_sym_dispatch", t0)
        idx_i2j = jnp.asarray(idx_i2j)
        idx_j2i = jnp.asarray(idx_j2i)
        vm_j = jnp.asarray(vm_j)
        vm_i = jnp.asarray(vm_i)
        Qj, Qi, fracs = self._edge_post(
            idx_i2j, idx_j2i, vm_j, vm_i,
            jnp.asarray(Qii), jnp.asarray(Qjj), jnp.asarray(Qji),
            jnp.asarray(Qij), q_conf=float(self.cfg["Q_conf"]),
        )
        fracs = np.asarray(fracs)       # (2, b) — the only payload pulled
        t0 = self._t("fg.fracs_pull", t0)  # device wait: matching cascades
        frac_j, frac_i = fracs[0][:n_real], fracs[1][:n_real]

        ii_arr = np.asarray(ii[:n_real])
        jj_arr = np.asarray(jj[:n_real])
        invalid = np.minimum(frac_j, frac_i) < min_match_frac
        consecutive = ii_arr == (jj_arr - 1)
        invalid = (~consecutive) & invalid
        if invalid.any() and is_reloc:
            return False
        keep = ~invalid
        if not keep.any():
            return False

        kept = np.flatnonzero(keep)
        nk = kept.size
        self._ensure_capacity(2 * nk)
        self._ensure_dev_capacity(self.n_directed + 2 * nk)
        # both directions per kept pair (two-way prep, global_opt.py:130-136):
        # rows [n, n+nk) hold i->j, rows [n+nk, n+2nk) hold j->i.
        # The scatter is padded to a FIXED 2*pad_to rows (padding rows index
        # past capacity and drop) so one jit shape serves every kept count.
        base = self.n_directed
        kj = jnp.asarray(np.concatenate([kept, np.zeros(pad_to - nk, np.int64)]))
        dst = np.full(2 * pad_to, self._dev_ecap, np.int64)
        dst[:nk] = base + np.arange(nk)
        dst[pad_to: pad_to + nk] = base + nk + np.arange(nk)
        rows = jnp.asarray(dst)
        idx_rows, vm_rows, q_rows = self._gather_pair_rows(
            idx_i2j, idx_j2i, vm_j, vm_i, Qj, Qi, kj
        )
        self._dev_edges["idx"] = self._scatter_rows(
            self._dev_edges["idx"], rows, idx_rows)
        self._dev_edges["vm"] = self._scatter_rows(
            self._dev_edges["vm"], rows, vm_rows)
        self._dev_edges["q"] = self._scatter_rows(
            self._dev_edges["q"], rows, q_rows)
        self.e_ii[base: base + nk] = ii_arr[kept]
        self.e_jj[base: base + nk] = jj_arr[kept]
        self.e_ii[base + nk: base + 2 * nk] = jj_arr[kept]
        self.e_jj[base + nk: base + 2 * nk] = ii_arr[kept]
        self.e_valid[base: base + 2 * nk] = True
        self.n_directed += 2 * nk
        for r in kept:
            self.ii.append(int(ii_arr[r]))
            self.jj.append(int(jj_arr[r]))
        self._t("fg.edge_store", t0)
        return True

    @staticmethod
    def _pow2(n, lo=8):
        c = lo
        while c < n:
            c *= 2
        return c

    def _solver_statics(self) -> dict:
        return dict(
            pixel_border=int(self.cfg["pixel_border"]),
            z_eps=float(self.cfg["depth_eps"]),
            sigma_pixel=float(self.cfg["sigma_pixel"]),
            sigma_depth=float(self.cfg["sigma_depth"]),
            C_thresh=float(self.cfg["C_conf"]),
            Q_thresh=float(self.cfg["Q_conf"]),
            max_iter=int(self.cfg["max_iters"]),
            delta_thresh=float(self.cfg["delta_norm"]),
            num_fix=1,
            point_stride=int(self.cfg.get("point_stride", 1)),
        )

    def _prewarm_solver(self, P: int, E: int):
        """AOT-compile the (P, E) solver variant on the shared serialized
        compile worker (runtime/prewarm.py).

        pow2 capacity growth otherwise re-jits the GN solver on the per-frame
        critical path — BENCH r02 showed 8-10 s frame stalls when the edge or
        pose pad stepped.  jit caches by abstract shape, so lowering with
        ShapeDtypeStructs off-thread makes the step-up hit a warm cache.
        Compiles are serialized globally: the bench host has one CPU core,
        and per-rung threads contending with the prewarm set slowed every
        compile ~10x (see prewarm.submit_compile)."""
        key = (P, E)
        if key in self._warmed:
            return
        self._warmed.add(key)

        def low():
            import jax
            import jax.numpy as jnp

            sds = jax.ShapeDtypeStruct
            n = self.h * self.w
            solver = (
                gauss_newton_calib if P <= self.DENSE_POSE_LIMIT
                else gauss_newton_calib_sparse
            )
            return solver.lower(
                sds((P, 8), jnp.float32),
                sds((P, n, 3), jnp.float32),
                sds((P, n, 1), jnp.float32),
                sds((3, 3), jnp.float32),
                sds((E,), jnp.int32),
                sds((E,), jnp.int32),
                sds((E, n), jnp.int32),
                sds((E, n), jnp.bool_),
                sds((E, n, 1), jnp.float32),
                sds((E,), jnp.bool_),
                sds((P,), jnp.bool_),
                self.h, self.w,
                **self._solver_statics(),
            )

        from artdeco_tpu.runtime.prewarm import submit_compile

        submit_compile(f"gn_solver[P={P},E={E}]", low)

    # dense assembly is O(P^2) memory (822 MB at P=2048); switch to the
    # block-sparse PCG solver above this many poses
    DENSE_POSE_LIMIT = 256

    def solve_GN_calib(self):
        import time as _time

        from artdeco_tpu.geometry import projection as proj

        t0 = _time.perf_counter()
        pin = int(self.cfg["pin"])
        n_e = self.n_directed
        uniq = np.unique(np.stack([self.e_ii[:n_e], self.e_jj[:n_e]]))
        if uniq.size <= pin:
            return
        remap_arr = np.zeros(int(uniq.max()) + 1, np.int64)
        remap_arr[uniq] = np.arange(uniq.size)

        import jax.numpy as jnp

        # incremental device sync: edge payloads are already device-resident
        # (written by add_factors); only changed pointmaps move host->device
        self._sync_poses_device(uniq)

        # pose/edge pads start high enough that the jitted solver
        # compiles once for typical runs instead of at every pow2 step
        P = self._pow2(uniq.size, lo=32)
        T = np.tile(np.asarray([0, 0, 0, 0, 0, 0, 1, 1], np.float32), (P, 1))
        used = np.zeros(P, bool)
        slot_of = np.zeros(P, np.int64)
        for k in uniq:
            i = int(remap_arr[k])
            T[i] = self.keyframes.T_WC[k]
            slot_of[i] = self._kf_slot[int(k)]
            used[i] = True

        # gather pose pointmaps from the device mirror (HBM-local) and
        # constrain to rays on device (global_opt.py:189-191) — one fused
        # dispatch (the eager gather + constrain chain was ~5 host RPCs)
        Xs_j, Cs_j = _gn_prep_jit(
            self._dev_X, self._dev_C, jnp.asarray(slot_of),
            jnp.asarray(used), jnp.asarray(self.K), self.h, self.w,
        )

        E = self._pow2(n_e, lo=64)
        ii_p = remap_arr[self.e_ii[:E]].astype(np.int32)
        jj_p = remap_arr[self.e_jj[:E]].astype(np.int32)

        solver = (
            gauss_newton_calib if P <= self.DENSE_POSE_LIMIT
            else gauss_newton_calib_sparse
        )
        if (
            self.mesh is not None
            and P <= self.DENSE_POSE_LIMIT
            and E % self.mesh.shape[self.mesh_axis] == 0
        ):
            solver = partial(gauss_newton_calib_sharded, self.mesh,
                             self.mesh_axis)
        idx_E, vm_E, q_E = self._slice_edges(
            self._dev_edges["idx"], self._dev_edges["vm"],
            self._dev_edges["q"], min(E, self._dev_ecap),
        )
        t0 = self._t("gn.prep", t0)
        T_new = solver(
            jnp.asarray(T), Xs_j, Cs_j, jnp.asarray(self.K),
            jnp.asarray(ii_p), jnp.asarray(jj_p),
            idx_E, vm_E, q_E,
            jnp.asarray(self.e_valid[:E]), jnp.asarray(used),
            self.h, self.w,
            **self._solver_statics(),
        )
        t0 = self._t("gn.solve_dispatch", t0)
        T_new = np.asarray(T_new)
        t0 = self._t("gn.pose_pull", t0)   # device wait: GN iterations
        # write back all but the pinned prefix (global_opt.py:231)
        upd = uniq[pin:]
        self.keyframes.update_T_WCs(
            T_new[remap_arr[upd]], upd
        )
        # warm the next capacity steps off-thread before growth hits the
        # per-frame path (including the dense->sparse solver switch)
        if uniq.size > P // 2:
            self._prewarm_solver(P * 2, E)
        if n_e > E // 2:
            self._prewarm_solver(P, E * 2)
        if uniq.size > P // 2 and n_e > E // 2:
            self._prewarm_solver(P * 2, E * 2)
