"""Pointmap matching cascade: iterative ray projection + descriptor refinement.

TPU-native re-implementation of the reference's matching stack:

* ``img_gradient`` / ``prep_for_iter_proj``: ``VSLAM/utils_matching.py:53-133``
* ``iter_proj``: CUDA kernel ``VSLAM/backend/src/matching_kernels.cu:119-275``
  (per-pixel 2-DoF Levenberg-Marquardt with bilinear ray interpolation).
* ``refine_matches``: CUDA kernel ``matching_kernels.cu:26-81`` (coarse-to-fine
  dilated window argmax over descriptor dot products).
* ``match_iterative_proj`` / ``match_pi3``: ``utils_matching.py:7-49,136-190``.

Design note (TPU): the CUDA kernels are one-thread-per-pixel scalar loops with
data-dependent gathers.  The TPU-native mapping is full vectorization over all
H*W pixels with XLA dynamic gathers (``jnp.take``) inside a ``lax.fori_loop``
over the (small, static) LM iteration count — the MXU is not involved and the
VPU processes all pixels per step, so there is no serial pixel loop at all.
All reference clamping/acceptance quirks are preserved bit-for-bit in f32
(they directly affect ATE — SURVEY.md §7 "hard parts").
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

# smallest positive normal float32 — replicates the CUDA init of
# max_score = numeric_limits::min() (a *positive* tiny value, NOT lowest);
# scores must exceed this for a refinement move to be accepted.
# numpy scalar, NOT jnp: a module-level concrete jnp array shared across
# traces is lifted to an executable PARAMETER on the second trace, and jax
# 0.9.0's pjit dispatch then drops it under signature alternation
# ("Execution supplied N buffers but compiled program expected N+1" /
# "INVALID_ARGUMENT: TPU backend error" — the r3/r4 pipeline crash).
import numpy as _np

_FLT_MIN = _np.float32(1.17549435e-38)


# ---------------------------------------------------------------------------
# Gradient + prep (pure XLA)
# ---------------------------------------------------------------------------

def img_gradient(img: jax.Array):
    """Scharr-like x/y gradients with reflect padding (utils_matching.py:53-86).

    img: (c, h, w) or (b, c, h, w). Kernel = 1/32 * [[-3,0,3],[-10,0,10],[-3,0,3]].
    Returns (gx, gy) with same shape as img.
    """
    squeeze = img.ndim == 3
    if squeeze:
        img = img[None]
    b, c, h, w = img.shape
    p = jnp.pad(img, ((0, 0), (0, 0), (1, 1), (1, 1)), mode="reflect")

    def sh(dy, dx):
        return p[:, :, 1 + dy : 1 + dy + h, 1 + dx : 1 + dx + w]

    gx = (
        3.0 * (sh(-1, 1) - sh(-1, -1))
        + 10.0 * (sh(0, 1) - sh(0, -1))
        + 3.0 * (sh(1, 1) - sh(1, -1))
    ) / 32.0
    gy = (
        3.0 * (sh(1, -1) - sh(-1, -1))
        + 10.0 * (sh(1, 0) - sh(-1, 0))
        + 3.0 * (sh(1, 1) - sh(-1, 1))
    ) / 32.0
    if squeeze:
        gx, gy = gx[0], gy[0]
    return gx, gy


def lin_to_pixel(idx: jax.Array, w: int) -> jax.Array:
    u = idx % w
    v = idx // w
    return jnp.stack([u, v], axis=-1)


def pixel_to_lin(p: jax.Array, w: int) -> jax.Array:
    return p[..., 0] + w * p[..., 1]


def prep_for_iter_proj(X11: jax.Array, X21: jax.Array, idx_1_to_2_init):
    """Build the 9-channel ray+gradient image, normalized target points and
    initial projections (utils_matching.py:109-133).

    X11, X21: (b, h, w, 3) pointmaps. Returns
    rays_with_grad (b,h,w,9), pts3d_norm (b,h*w,3), p_init (b,h*w,2) float.
    """
    b, h, w, _ = X11.shape
    rays = X11 / jnp.linalg.norm(X11, axis=-1, keepdims=True)
    # channels-LAST gradients: moveaxis to NCHW and back forces XLA relayouts
    # of a minor-dim-3 array, which cost ~100ms at 512x384 on TPU
    p = jnp.pad(rays, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")

    def sh(dy, dx):
        return p[:, 1 + dy : 1 + dy + h, 1 + dx : 1 + dx + w, :]

    gx = (
        3.0 * (sh(-1, 1) - sh(-1, -1))
        + 10.0 * (sh(0, 1) - sh(0, -1))
        + 3.0 * (sh(1, 1) - sh(1, -1))
    ) / 32.0
    gy = (
        3.0 * (sh(1, -1) - sh(-1, -1))
        + 10.0 * (sh(1, 0) - sh(-1, 0))
        + 3.0 * (sh(1, 1) - sh(-1, 1))
    ) / 32.0
    rays_with_grad = jnp.concatenate([rays, gx, gy], axis=-1)  # (b,h,w,9)

    X21_vec = X21.reshape(b, h * w, 3)
    pts3d_norm = X21_vec / jnp.linalg.norm(X21_vec, axis=-1, keepdims=True)

    if idx_1_to_2_init is None:
        idx_1_to_2_init = jnp.broadcast_to(jnp.arange(h * w), (b, h * w))
    p_init = lin_to_pixel(idx_1_to_2_init, w).astype(jnp.float32)
    return rays_with_grad, pts3d_norm, p_init


# ---------------------------------------------------------------------------
# iter_proj — vectorized per-pixel 2-DoF LM (matching_kernels.cu:119-275)
# ---------------------------------------------------------------------------

def _pack_corners(img_flat: jax.Array, w: int) -> jax.Array:
    """(h*w, c) -> (h*w, 4c) rows [img[i], img[i+1], img[i+w], img[i+w+1]].

    TPU gathers pay per ROW fetched (a full lane-line regardless of row
    width), so packing all four bilinear taps into one row makes each LM
    step one gather instead of four.  Rolls wrap at the bottom edge, but
    sample coords are clipped to [1, h-2] so wrapped rows are never hit.
    """
    s1 = jnp.roll(img_flat, -1, axis=0)
    sw = jnp.roll(img_flat, -w, axis=0)
    sw1 = jnp.roll(img_flat, -w - 1, axis=0)
    return jnp.concatenate([img_flat, s1, sw, sw1], axis=-1)


def _bilinear_weights(u: jax.Array, v: jax.Array):
    """Reference corner/weight pairing (matching_kernels.cu:155-183):
    weights computed from (du, dv) pair with pixels at the OPPOSITE corner."""
    u11 = jnp.floor(u)
    v11 = jnp.floor(v)
    du = u - u11
    dv = v - v11
    iu = u11.astype(jnp.int32)
    iv = v11.astype(jnp.int32)
    w11 = (du * dv)[:, None]          # pairs with (v+1, u+1)
    w12 = ((1.0 - du) * dv)[:, None]  # pairs with (v+1, u)
    w21 = (du * (1.0 - dv))[:, None]  # pairs with (v, u+1)
    w22 = ((1.0 - du) * (1.0 - dv))[:, None]  # pairs with (v, u)
    return iu, iv, w11, w12, w21, w22


def _bilinear_gather_packed(packed: jax.Array, c: int, u, v, w: int,
                            lo: int = 0, hi: int | None = None):
    """One-gather bilinear sample from a _pack_corners array.

    c = channel count of the original image; lo:hi selects a channel
    sub-range (e.g. rays only).  Returns (n, hi-lo).
    """
    if hi is None:
        hi = c
    iu, iv, w11, w12, w21, w22 = _bilinear_weights(u, v)
    smp = jnp.take(packed, iv * w + iu, axis=0)  # (n, 4c)
    r22 = smp[:, lo:hi]
    r21 = smp[:, c + lo : c + hi]
    r12 = smp[:, 2 * c + lo : 2 * c + hi]
    r11 = smp[:, 3 * c + lo : 3 * c + hi]
    return w11 * r11 + w12 * r12 + w21 * r21 + w22 * r22


def _bilinear_gather(img_flat: jax.Array, u: jax.Array, v: jax.Array, h: int, w: int):
    """Four-gather bilinear sample of a (h*w, c) flattened image (kept for
    one-shot callers; the LM loop uses the packed single-gather variant)."""
    iu, iv, w11, w12, w21, w22 = _bilinear_weights(u, v)
    base = iv * w + iu
    r22 = jnp.take(img_flat, base, axis=0)
    r21 = jnp.take(img_flat, base + 1, axis=0)
    r12 = jnp.take(img_flat, base + w, axis=0)
    r11 = jnp.take(img_flat, base + w + 1, axis=0)
    return w11 * r11 + w12 * r12 + w21 * r21 + w22 * r22


def _iter_proj_single(
    rays_img: jax.Array,  # (h, w, 9)
    pts3d_norm: jax.Array,  # (n, 3)
    p_init: jax.Array,  # (n, 2) float
    max_iter: int,
    lambda_init: float,
    cost_thresh: float,
):
    h, w, _ = rays_img.shape
    img_flat = rays_img.reshape(h * w, 9)
    packed = _pack_corners(img_flat, w)  # (h*w, 36): all 4 taps per row

    # TPU layout: ALL per-pixel state lives channel-MAJOR (c, n) so the lane
    # dimension is the dense pixel axis.  The channel-minor (n, 9/36) layout
    # pads 9->128 lanes and ran every per-step fusion at ~7% lane efficiency
    # (measured 0.55 ms per fusion at 147k pixels; this layout makes them
    # ~50 us).  Only the gather table stays row-major for contiguous rows.
    ptsT = pts3d_norm.T  # (3, n)

    u0 = jnp.clip(p_init[:, 0], 1.0, w - 2.0)
    v0 = jnp.clip(p_init[:, 1], 1.0, h - 2.0)
    lam0 = jnp.full_like(u0, lambda_init)
    conv0 = jnp.zeros(u0.shape, dtype=bool)

    def gather_full_T(u, v):
        """One packed-row gather, transposed to (36, n) for the math."""
        iu, iv, w11, w12, w21, w22 = _bilinear_weights(u, v)
        smp = jnp.take(packed, iv * w + iu, axis=0).T  # (36, n)
        wts = jnp.stack([w22[:, 0], w21[:, 0], w12[:, 0], w11[:, 0]])  # (4,n)
        return smp, wts

    def interp(smpT, wts, lo, hi):
        """Bilinear-combine corner channels [lo,hi) -> ((hi-lo), n).

        Summation order matches _bilinear_gather_packed exactly
        (w11*r11 + w12*r12 + w21*r21 + w22*r22) so accept decisions are
        bit-identical to the row-major implementation."""
        return (
            wts[3] * smpT[27 + lo : 27 + hi]
            + wts[2] * smpT[18 + lo : 18 + hi]
            + wts[1] * smpT[9 + lo : 9 + hi]
            + wts[0] * smpT[lo:hi]
        )

    def cost_at(smpT, wts):
        r = interp(smpT, wts, 0, 3)
        # exact sqrt+divide (not rsqrt): matches the CUDA kernel and the
        # row-major implementation bit-for-bit
        r = r / jnp.sqrt(jnp.sum(r * r, axis=0, keepdims=True))
        err = r - ptsT
        return err, jnp.sum(err * err, axis=0)

    def body(_, carry):
        # smpT/wts sample the 4 corners AT the current (u, v): the candidate-
        # position gather doubles as the next iteration's current-position
        # gather on accept (and the rejected position's sample is already in
        # the carry), so each LM step costs ONE gather instead of two
        u, v, lam, conv, smpT, wts = carry
        err, cost = cost_at(smpT, wts)
        gx = interp(smpT, wts, 3, 6)
        gy = interp(smpT, wts, 6, 9)

        A00 = jnp.sum(gx * gx, axis=0) + lam
        A01 = jnp.sum(gx * gy, axis=0)
        A11 = jnp.sum(gy * gy, axis=0) + lam
        b0 = -jnp.sum(err * gx, axis=0)
        b1 = -jnp.sum(err * gy, axis=0)

        det_inv = 1.0 / (A00 * A11 - A01 * A01)
        du = det_inv * (A11 * b0 - A01 * b1)
        dv = det_inv * (-A01 * b0 + A00 * b1)

        u_new = jnp.clip(u + du, 1.0, w - 2.0)
        v_new = jnp.clip(v + dv, 1.0, h - 2.0)
        smpT_new, wts_new = gather_full_T(u_new, v_new)
        _, new_cost = cost_at(smpT_new, wts_new)

        accept = new_cost < cost
        u = jnp.where(accept, u_new, u)
        v = jnp.where(accept, v_new, v)
        smpT = jnp.where(accept[None, :], smpT_new, smpT)
        wts = jnp.where(accept[None, :], wts_new, wts)
        lam = jnp.where(accept, lam * 0.1, lam * 10.0)
        conv = jnp.where(accept, new_cost < cost_thresh, cost < cost_thresh)
        return u, v, lam, conv, smpT, wts

    # statically unrolled: gathers inside lax loops lower to slow serialized
    # TPU gathers, unrolling lets XLA pipeline them (~10x faster here).
    # The CUDA kernel exits per pixel at convergence (matching_kernels.cu
    # convergence flag); SIMD can't skip lanes, but after the head
    # iterations nearly every pixel has converged, so the unrolled tail is
    # gated on the surviving fraction — identical results whenever more
    # than early_exit_frac of pixels still need iterations.
    smpT0, wts0 = gather_full_T(u0, v0)
    carry = (u0, v0, lam0, conv0, smpT0, wts0)
    head = min(4, max_iter)
    for i in range(head):
        carry = body(i, carry)
    if max_iter > head:
        def tail(c):
            for i in range(head, max_iter):
                c = body(i, c)
            return c

        early_exit_frac = 0.002
        unconv = 1.0 - jnp.mean(carry[3].astype(jnp.float32))
        carry = jax.lax.cond(
            unconv > early_exit_frac, tail, lambda c: c, carry
        )
    u, v, lam, conv = carry[:4]
    return jnp.stack([u, v], axis=-1), conv


@partial(jax.jit, static_argnames=("max_iter",))
def iter_proj(
    rays_with_grad_img: jax.Array,  # (b, h, w, 9)
    pts3d_norm: jax.Array,  # (b, n, 3)
    p_init: jax.Array,  # (b, n, 2)
    max_iter: int = 10,
    lambda_init: float = 1e-8,
    cost_thresh: float = 1e-8,
):
    """Project unit rays of frame 2 onto frame 1's ray image via per-pixel LM.

    Returns (p_new float (b,n,2), converged bool (b,n)).
    """
    fn = partial(
        _iter_proj_single,
        max_iter=max_iter,
        lambda_init=lambda_init,
        cost_thresh=cost_thresh,
    )
    return jax.vmap(fn)(rays_with_grad_img, pts3d_norm, p_init)


# ---------------------------------------------------------------------------
# refine_matches — dilated descriptor argmax (matching_kernels.cu:26-81)
# ---------------------------------------------------------------------------

def _refine_single(
    D11: jax.Array,  # (h, w, f)
    D21: jax.Array,  # (n, f)
    p1: jax.Array,  # (n, 2) int
    radius: int,
    dilation_max: int,
    compute_dtype=None,
):
    """TPU gather-granularity trick: per-pixel descriptor lookups at the 81
    window offsets are tiny (f*4 = 96B) random rows, which gather at a few
    percent of HBM bandwidth.  But for a FIXED offset the lookup over all
    pixels is just a statically shifted image, so we zero-pad D11, take the
    span static slices for one u-offset column, concatenate them channel-wise
    and do ONE wide-row gather (span*f floats per row) at the per-pixel match
    positions.  Zero padding reproduces the CUDA kernel's ``inside`` mask for
    free: out-of-image offsets score exactly 0.0, which can never exceed the
    +FLT_MIN-initialized running max (matching_kernels.cu:26-81).
    """
    h, w, f = D11.shape
    if compute_dtype is not None:
        # the search is HBM-bound (405 window offsets x n pixels x f floats);
        # bf16 halves gather traffic.  Scores accumulate in f32; only near-tie
        # argmax picks can flip, which are equivalent-quality matches.
        D11 = D11.astype(compute_dtype)
        D21 = D21.astype(compute_dtype)
    u0 = p1[:, 0].astype(jnp.int32)
    v0 = p1[:, 1].astype(jnp.int32)

    # max_score persists ACROSS dilation levels (declared outside the d-loop
    # in the CUDA kernel) and is initialized to +FLT_MIN, so non-positive
    # scores never displace the initial match.
    max_score = jnp.full(u0.shape, _FLT_MIN, dtype=jnp.float32)
    u_new, v_new = u0, v0

    span = 2 * radius + 1
    for d in range(dilation_max, 0, -1):
        rd = radius * d
        P = jnp.pad(D11, ((rd, rd), (rd, rd), (0, 0)))
        lin0 = v0 * w + u0  # original-grid rows of the shifted stacks
        # ALL span*span shifted images stacked channel-wise, then ONE wide-
        # row gather at the per-pixel match positions: rows of span^2*f
        # elements (~4 KB at bf16) stream at HBM bandwidth, where the
        # previous per-u-column formulation issued span gathers of span*f
        # (~400 B) rows per level and ran at a few percent of it.
        # Offset order: i (u) outer, j (v) inner — ties resolve to the first
        # maximum exactly like the CUDA kernel's loop nest
        # (matching_kernels.cu:26-81).
        stack = jnp.concatenate(
            [
                # row start = (dv + rd) = j*d, col start = (du + rd) = i*d
                P[j * d : j * d + h, i * d : i * d + w]
                for i in range(span)
                for j in range(span)
            ],
            axis=-1,
        ).reshape(h * w, span * span * f)
        feats = jnp.take(stack, lin0, axis=0).reshape(-1, span * span, f)
        scores = jnp.einsum(
            "nof,nf->no", feats, D21,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        best = jnp.argmax(scores, axis=-1)  # first max wins (i outer, j inner)
        best_score = jnp.take_along_axis(scores, best[:, None], axis=-1)[:, 0]
        bi = (best // span).astype(jnp.int32)
        bj = (best % span).astype(jnp.int32)
        upd = best_score > max_score
        max_score = jnp.where(upd, best_score, max_score)
        u_new = jnp.where(upd, u0 - rd + bi * d, u_new)
        v_new = jnp.where(upd, v0 - rd + bj * d, v_new)
        u0, v0 = u_new, v_new

    return jnp.stack([u_new, v_new], axis=-1)


def _use_dense_refine(compute_dtype) -> bool:
    """The dense-stencil path (ops/refine_dense.py, pure XLA) serves the
    production bf16 search on every backend; the f32/golden path keeps the
    wide-row-gather stack implementation (same semantics)."""
    return (
        compute_dtype is not None
        and jnp.dtype(compute_dtype) == jnp.bfloat16
    )


class _RefineTelemetry:
    """Host-side accumulator for the dense cascade's dropped-loser counts.

    The counts are device scalars appended WITHOUT synchronization (the hot
    path never blocks on them); folding and the final readback happen lazily
    when :func:`refine_overflow_total` is called (end-of-run reporting).
    SURVEY §5 "no silent caps": the collision budget is observable."""

    def __init__(self):
        self._pending: list = []
        self._total = 0

    def record(self, x):
        self._pending.append(x)
        if len(self._pending) >= 256:
            self._flush()

    def _flush(self):
        if self._pending:
            s = self._pending[0]
            for x in self._pending[1:]:
                s = s + x
            self._total += int(s)
            self._pending = []

    def total(self) -> int:
        self._flush()
        return self._total

    def reset(self):
        self._pending = []
        self._total = 0


_refine_telemetry = _RefineTelemetry()


def refine_overflow_total() -> int:
    """Total matches that kept an unrefined position because the per-level
    collision-loser budget overflowed (0 in healthy runs).  Syncs."""
    return _refine_telemetry.total()


def reset_refine_telemetry():
    _refine_telemetry.reset()


@partial(jax.jit, static_argnames=("radius", "dilation_max", "compute_dtype",
                                   "force_dense", "return_dropped"))
def refine_matches(
    D11: jax.Array,  # (b, h, w, f) descriptors of frame 1
    D21: jax.Array,  # (b, n, f) descriptors of frame 2 (flattened)
    p1: jax.Array,  # (b, n, 2) int matches into frame 1
    radius: int = 3,
    dilation_max: int = 1,
    compute_dtype=None,
    force_dense: bool = False,
    return_dropped: bool = False,
    valid: jax.Array = None,  # (b, n) bool — queries to refine (None = all)
):
    """Coarse-to-fine local descriptor search around current matches.

    Two implementations with identical semantics:

    * dense-stencil cascade (``ops/refine_dense.py``) — the bf16 hot path;
      zero per-pixel gathers (claim/scatter + static-shift score maps).
    * wide-row-gather stack — f32 golden path.

    ``valid`` (dense path only) restricts the search to matches that pass
    the occlusion distance filter — semantics-preserving because every
    downstream consumer masks by the same validity, and it keeps border
    clamp pileups out of the collision passes (see refine_dense).

    With ``return_dropped`` returns (p_new, n_dropped); the dense cascade
    now drains all collision losers, so n_dropped is 0 unless the drain
    bound itself (ceil(N/chunk) passes) is exceeded — impossible by
    construction, kept observable per SURVEY "no silent caps".

    Batch handling: the dense path vmaps (compact transients, batched
    einsums); the stack path lax.maps because each sample materializes a
    (h*w, span^2*f) transient — ~0.6 GB at production scale — and vmap
    would multiply that by b.
    """
    if force_dense or _use_dense_refine(compute_dtype):
        from artdeco_tpu.ops.refine_dense import refine_matches_dense_single

        fn = partial(
            refine_matches_dense_single,
            radius=radius,
            dilation_max=dilation_max,
        )
        if D11.shape[0] == 1:
            p, nd = fn(D11[0], D21[0], p1[0],
                       valid=None if valid is None else valid[0])
            p, nd = p[None].astype(p1.dtype), nd
        else:
            # vmap (not lax.map): batching the dense cascade turns 8
            # sequential small einsums/scatters into batched ones (better
            # TPU utilization); its transient growth (~0.5 GB at the 8-way
            # symmetric batch, 512x288) is within budget.  lax.map would
            # also hoist any concrete body constant into an executable
            # parameter, which is the failure surface behind the r3/r4
            # pipeline crash (see ops/refine_dense.py DISPATCH HAZARD).
            if valid is None:
                p, nd = jax.vmap(fn)(D11, D21, p1)
            else:
                p, nd = jax.vmap(
                    lambda a, b, c, v: fn(a, b, c, valid=v)
                )(D11, D21, p1, valid)
            p, nd = p.astype(p1.dtype), jnp.sum(nd)
        return (p, nd) if return_dropped else p
    fn = partial(_refine_single, radius=radius, dilation_max=dilation_max,
                 compute_dtype=compute_dtype)
    if D11.shape[0] == 1:
        p = fn(D11[0], D21[0], p1[0])[None]
    else:
        p = jax.lax.map(lambda t: fn(*t), (D11, D21, p1))
    return (p, jnp.int32(0)) if return_dropped else p


# ---------------------------------------------------------------------------
# Full cascades (utils_matching.py:7-49, 89-190)
# ---------------------------------------------------------------------------

@partial(
    jax.jit,
    static_argnames=(
        "max_iter", "lambda_init", "cost_thresh", "dist_thresh",
        "radius", "dilation_max", "refine_dtype",
    ),
)
def _match_cascade(
    X11, X21, D11, D21, idx_1_to_2_init,
    *, max_iter, lambda_init, cost_thresh, dist_thresh, radius, dilation_max,
    refine_dtype=None,
):
    """One fused jit for the whole cascade.  The glue between the stages
    (gathers, norms, reshapes) is tiny, but run eagerly each op is a separate
    device dispatch — on a remote-tunnel TPU that dominated end-to-end match
    latency (~600ms of round-trips for ~30ms of compute)."""
    b, h, w = X21.shape[:3]
    rays_with_grad, pts3d_norm, p_init = prep_for_iter_proj(
        X11, X21, idx_1_to_2_init
    )
    p1, valid_proj2 = iter_proj(
        rays_with_grad,
        pts3d_norm,
        p_init,
        max_iter=max_iter,
        lambda_init=lambda_init,
        cost_thresh=cost_thresh,
    )
    p1 = p1.astype(jnp.int32)  # truncation == floor for non-negative coords

    # Occlusion distance filter (utils_matching.py:161-168)
    X11_flat = X11.reshape(b, h * w, 3)
    lin = pixel_to_lin(p1, w)
    matched = jnp.take_along_axis(X11_flat, lin[..., None], axis=1)
    dists2 = jnp.linalg.norm(matched - X21.reshape(b, h * w, 3), axis=-1)
    valid = valid_proj2 & (dists2 < dist_thresh)

    dropped = jnp.int32(0)
    if D11 is not None and radius > 0:
        D21_flat = D21.reshape(b, h * w, -1)
        p1, dropped = refine_matches(
            D11,
            D21_flat,
            p1,
            radius=radius,
            dilation_max=dilation_max,
            compute_dtype=refine_dtype,
            return_dropped=True,
            valid=valid,
        )

    idx_1_to_2 = pixel_to_lin(p1, w)
    return idx_1_to_2, valid[..., None], dropped


def match_iterative_proj(
    cfg: dict,
    X11: jax.Array,  # (b, h, w, 3)
    X21: jax.Array,  # (b, h, w, 3)
    D11: jax.Array | None,  # (b, h, w, f)
    D21: jax.Array | None,  # (b, h, w, f)
    idx_1_to_2_init: jax.Array | None = None,
):
    """iter_proj -> occlusion distance filter -> refine_matches, fused in one
    jit (utils_matching.py:136-190).

    cfg: the ``matching`` config block (max_iter, lambda_init,
    convergence_thresh, dist_thresh, radius, dilation_max).
    Returns (idx_1_to_2 (b,n) int32, valid (b,n,1) bool).

    BATCHES RUN AS SEQUENTIAL b=1 DISPATCHES, not one vmapped program.
    Measured on v5e at 512x288 (scripts/profile_stages.py): the vmapped
    cascade is strongly SUPERLINEAR in b — per-cascade cost 74 ms at b=1,
    132 at b=2, 153 at b=4, 211 at b=8 (refine 62->905 ms, iter_proj
    20->776 ms at b=8): batching turns the per-pixel gathers/scatters into
    batched-gather ops that TPU lowers to near-scalar loops.  Sequential
    single-sample dispatches execute back-to-back on the device queue
    (dispatch is async), so 2b cascades cost 2b x 74 ms — ~3x faster at the
    8-cascade symmetric batch — and only ONE (b=1) program shape ever
    compiles."""
    statics = dict(
        max_iter=int(cfg["max_iter"]),
        lambda_init=float(cfg["lambda_init"]),
        cost_thresh=float(cfg["convergence_thresh"]),
        dist_thresh=float(cfg["dist_thresh"]),
        radius=int(cfg["radius"]) if D11 is not None else 0,
        dilation_max=int(cfg["dilation_max"]),
        # bf16 descriptor search by default: halves the HBM-bound gather
        # traffic; pass refine_dtype=None in cfg for the exact f32 path.
        refine_dtype=cfg.get("refine_dtype", "bfloat16"),
    )
    b = X11.shape[0]
    if b == 1:
        idx, valid, dropped = _match_cascade(
            X11, X21, D11, D21, idx_1_to_2_init, **statics
        )
        _refine_telemetry.record(dropped)
        return idx, valid
    outs = []
    for e in range(b):
        e_dev = jnp.int32(e)
        init_e = (None if idx_1_to_2_init is None
                  else _slice_row(idx_1_to_2_init, e_dev))
        outs.append(_match_cascade(
            _slice_row(X11, e_dev), _slice_row(X21, e_dev),
            None if D11 is None else _slice_row(D11, e_dev),
            None if D21 is None else _slice_row(D21, e_dev),
            init_e, **statics,
        ))
    idx = _concat_rows(*[o[0] for o in outs])
    valid = _concat_rows(*[o[1] for o in outs])
    for o in outs:
        _refine_telemetry.record(o[2])
    return idx, valid


@jax.jit
def _slice_row(a, e):
    """One (1, ...) batch-row slice as a jitted dispatch; ``e`` is traced so
    every row shares one executable (an eager a[e:e+1] costs ~9 ms of
    blocking host RPC on the tunneled backend)."""
    return jax.lax.dynamic_slice_in_dim(a, e, 1, 0)


@jax.jit
def _concat_rows(*xs):
    return jnp.concatenate(xs, axis=0)


def match(cfg, X11, X21, D11, D21, idx_1_to_2_init=None):
    return match_iterative_proj(cfg, X11, X21, D11, D21, idx_1_to_2_init)


def match_pi3(cfg, X11, X21, idx_1_to_2_init=None):
    """Descriptor-free variant used by the Pi3 loop-closure path
    (utils_matching.py:7-49). Returns (idx (b,n), valid (b,n))."""
    idx, valid = match_iterative_proj(cfg, X11, X21, None, None, idx_1_to_2_init)
    return idx, valid[..., 0]
