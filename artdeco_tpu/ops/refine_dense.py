"""Dense-stencil TPU implementation of the refine_matches descriptor search.

Reference semantics: ``VSLAM/backend/src/matching_kernels.cu:26-81`` — per
pixel n with current match center p, search the (2r+1)^2 window at dilations
d = dilation_max..1 for the descriptor dot-product argmax; the running max
(init +FLT_MIN) persists across dilation levels and the window re-centers on
the current best after every level.

TPU design (why not a gather): per-pixel window gathers move ~3 GB/cascade of
scattered 48-byte rows through HBM — measured 70+ ms at 512x288.  Instead we
make the search DENSE in image-1 space:

  1. claim: one scatter-min resolves, per image-1 position, a single winning
     query pixel (deterministic: lowest pixel id wins, like first-arrival in
     a stable ordering).  ~95% of pixels win their position on real data.
  2. scatter the winners' 24-d descriptors into an image-1-shaped grid G; for
     each of the 81 window offsets the score map is a STATIC shift of D11
     against G — an elementwise multiply-reduce over channels with no gathers
     at all.  Zero-padding reproduces the CUDA ``inside_image`` mask exactly:
     out-of-image offsets score 0.0, which can never beat the
     +FLT_MIN-initialised running max.
  3. collision losers (pixels whose center was claimed by another query) are
     processed exactly by one fixed-size compact-and-gather pass per level
     (budget _SPARSE_CHUNK; see the coverage note on
     refine_matches_dense_single).

The dense stencil itself (step 2) is pure XLA: a ``fori_loop`` over the 81
offsets, each a dynamic-slice + channel-contraction + running max.  An
earlier round implemented it as a Pallas kernel (VMEM-resident column
strips); that kernel passed every isolated golden test but deterministically
corrupted TPU backend state under repeated in-pipeline execution (the r3
bench died with INVALID_ARGUMENT at the second keyframe's add_factors; with
the kernel bypassed the identical pipeline ran clean — VERDICT r3 weak #1).
The XLA formulation has identical semantics and its per-offset traffic
(~14 MB read at 512x288xf24 bf16) streams at HBM bandwidth, so the whole
5-level cascade stays at a few ms — the kernel's VMEM residency was never
the bottleneck, the gather avoidance was.

Numerics match the XLA stack implementation (bf16 descriptor products
accumulated in f32); near-tie argmax picks can differ only by f32 summation
order, identical to the stack-vs-CUDA relationship.

DISPATCH HAZARD (root cause of the r3/r4 pipeline crashes): a module-level
CONCRETE ``jnp`` array (the old ``_FLT_MIN = jnp.float32(...)``) that is
closed over by more than one trace of the same jitted function gets lifted
into an executable PARAMETER on the re-trace, and jax 0.9.0's pjit dispatch
then drops that parameter once the cache sees alternating batch signatures:
the call sequence b1, b8, b1, b8 deterministically failed with ``Execution
supplied 3 buffers but compiled program expected 4`` on CPU and the opaque
``INVALID_ARGUMENT: TPU backend error`` on the tunneled TPU backend (the r3
bench crash at the 2nd keyframe's add_factors; isolated repros passed
because a fresh process never re-traced).  Module constants used inside
traced code must be PYTHON/numpy scalars (trace-time literals), never jnp
arrays.  Regression: tests/test_matching.py::
test_cascade_batch_alternation_regression.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

# numpy scalar, NOT jnp — a module-level concrete jnp array becomes a lifted
# executable parameter on re-trace, which jax 0.9.0's dispatch drops under
# batch-signature alternation (the r3/r4 pipeline crash; see module
# docstring and ops/matching.py)
import numpy as _np

_FLT_MIN = _np.float32(1.17549435e-38)

# collision losers processed per level (static shape)
_SPARSE_CHUNK = 16384


def _dense_best(Ppad, G, *, span, d):
    """Running window max over the span^2 offsets, fully dense.

    Ppad: (f, H + 2rd, W + 2rd) bf16 zero-padded image-1 descriptors;
    G: (f, H, W) bf16 claimed query descriptors at their center positions.
    Returns best (H, W) f32 scores and bo (H, W) int32 offset ids in
    i(u)-outer / j(v)-inner order — strict > updates give CUDA first-max
    tie-breaking (matching_kernels.cu:54-76).
    """
    f, Hp, Wp = Ppad.shape
    H, W = G.shape[1], G.shape[2]

    def body(o, carry):
        best, bo = carry
        i = o // span
        j = o % span
        p = jax.lax.dynamic_slice(Ppad, (0, j * d, i * d), (f, H, W))
        acc = jnp.einsum(
            "fhw,fhw->hw", p, G, preferred_element_type=jnp.float32
        )
        upd = acc > best
        return jnp.where(upd, acc, best), jnp.where(upd, o, bo)

    best0 = jnp.full((H, W), -jnp.inf, jnp.float32)
    bo0 = jnp.zeros((H, W), jnp.int32)
    return jax.lax.fori_loop(0, span * span, body, (best0, bo0))


def _sparse_scores(Prows, D21q, iu, iv, *, span, d, f, w, Wp):
    """Exact window scores for an arbitrary pixel subset.

    Prows: (Hp*Wp, f) bf16 zero-padded image-1 descriptors (row per padded
    pixel); iu/iv: (C,) int32 centers (image coords); D21q: (C, f) bf16
    queries.  Returns (C, span*span) f32 scores in i-outer/j-inner order.

    One flat row take of C*span^2 descriptor rows: large slice_sizes
    gathers scalarize on TPU (measured 293 ms per 16k chunk), per-row takes
    run at transaction granularity (~1-2 ms)."""
    C = iu.shape[0]
    off = jnp.arange(span, dtype=jnp.int32) * d
    # padded coords: window sample (i, j) lives at (iv + j*d, iu + i*d)
    rows = iv[:, None, None] + off[None, None, :]  # (C, 1, span_j) broadcast
    cols = iu[:, None, None] + off[None, :, None]  # (C, span_i, 1)
    lin = (rows * Wp + cols).reshape(C, span * span)  # i-outer, j-inner
    win = jnp.take(Prows, lin, axis=0)  # (C, span^2, f)
    return jnp.einsum(
        "nof,nf->no", win, D21q, preferred_element_type=jnp.float32
    )


def refine_matches_dense_single(
    D11: jax.Array,  # (h, w, f) descriptors of frame 1
    D21: jax.Array,  # (n, f) query descriptors (flattened frame 2)
    p1: jax.Array,  # (n, 2) int current matches into frame 1
    radius: int = 4,
    dilation_max: int = 5,
    interpret: bool = False,  # kept for call-site compat; pure-XLA now
):
    """See module docstring.  Performance note (measured, v5e): EVERY
    147k-scale random-access op (gather/scatter of any payload) costs
    ~1.4 ms on TPU regardless of byte count, and every lax control-flow
    region in a large live set costs ~4 ms — so this function packs all
    per-level position lookups into single takes and runs ONE unconditional
    collision pass per level.

    Coverage: results are exactly the reference cascade whenever the number
    of collision losers per level is <= _SPARSE_CHUNK (always true for
    N <= 16384, and true at 512x288 up to an 11% collision rate — well
    above well-tracked-frame rates).  Beyond that budget, surplus losers
    keep their current (valid, unrefined) match for that level; the count of
    such dropped losers is RETURNED (summed over levels) so callers can
    surface the degradation instead of silently capping (SURVEY "no silent
    caps"; see artdeco_tpu.ops.matching telemetry).

    Returns (p_new (n, 2) int32, n_dropped () int32).
    """
    del interpret
    h, w, f = D11.shape
    hw = h * w
    N = p1.shape[0]  # query count; need not equal h*w
    span = 2 * radius + 1
    chunk = min(_SPARSE_CHUNK, N)

    D11b = D11.astype(jnp.bfloat16)
    D21b = D21.astype(jnp.bfloat16)
    D11T = jnp.transpose(D11b, (2, 0, 1))  # (f, h, w)

    ids = jnp.arange(N, dtype=jnp.int32)
    u0 = p1[:, 0].astype(jnp.int32)
    v0 = p1[:, 1].astype(jnp.int32)
    max_score = jnp.full((N,), _FLT_MIN, jnp.float32)
    n_dropped = jnp.int32(0)

    # int32 values ride inside f32 tables so each per-pixel lookup is ONE
    # take.  A raw bitcast of a small int is a DENORMAL f32, and TPU vector
    # passes flush denormals to zero (CPU does not) — so set an exponent bit
    # to keep every packed value a normal float (values < 2^30 required).
    bc = lambda x: jax.lax.bitcast_convert_type(
        x | jnp.int32(0x40000000), jnp.float32)
    bci = lambda x: (
        jax.lax.bitcast_convert_type(x, jnp.int32) & jnp.int32(0x3FFFFFFF))

    for d in range(dilation_max, 0, -1):
        rd = radius * d

        # --- claim: one winner query per center position (lowest id) ---
        lin = v0 * w + u0
        inv = jnp.full((hw,), N, jnp.int32).at[lin].min(ids)

        # --- dense pass over claimed winners ---
        winner = jnp.minimum(inv, N - 1)
        Grow = jnp.where((inv < N)[:, None], D21b[winner], 0)
        G3 = jnp.transpose(Grow.reshape(h, w, f), (2, 0, 1))  # (f, h, w)
        Ppad = jnp.pad(D11T, ((0, 0), (rd, rd), (rd, rd)))
        best, bo = _dense_best(Ppad, G3, span=span, d=d)
        bestmap = best.reshape(-1)
        bomap = bo.reshape(-1)

        # ONE take for (winner id, best score, best offset) per center
        ptab = jnp.stack([bc(inv), bestmap, bc(bomap)], axis=-1)  # (hw, 3)
        prow = jnp.take(ptab, lin, axis=0)  # (N, 3)
        claimed = bci(prow[:, 0]) == ids
        bs = prow[:, 1]
        bon = bci(prow[:, 2])
        bi = bon // span
        bj = bon % span
        upd = claimed & (bs > max_score)
        max_score = jnp.where(upd, bs, max_score)
        u_new = jnp.where(upd, u0 - rd + bi * d, u0)
        v_new = jnp.where(upd, v0 - rd + bj * d, v0)

        # --- collision losers: one unconditional sparse pass ---
        Wp = w + 2 * rd
        Prows = jnp.pad(
            D11b, ((rd, rd), (rd, rd), (0, 0))
        ).reshape((h + 2 * rd) * Wp, f)

        active = ~claimed
        # compact the first `chunk` active ids without a sort: prefix
        # positions via cumsum, scatter ids into a fixed-size slot array.
        # Two-phase priority: out-of-view pixels clamp to the border ring
        # (iter_proj clips coords to [1, w-2]) and collide there by the
        # thousands; those losers are occlusion-filtered invalid downstream,
        # so INTERIOR losers take budget slots first and border pileups
        # only fill what remains (a plain id-order compact let top-row
        # border pixels exhaust the budget before any interior loser).
        border = (u0 <= 1) | (u0 >= w - 2) | (v0 <= 1) | (v0 >= h - 2)
        act_int = active & ~border
        act_bor = active & border
        pos_int = jnp.cumsum(act_int.astype(jnp.int32)) - 1
        n_int = jnp.sum(act_int.astype(jnp.int32))
        pos_bor = jnp.cumsum(act_bor.astype(jnp.int32)) - 1 + n_int
        pos = jnp.where(act_int, pos_int, pos_bor)
        tgt = jnp.where(active & (pos < chunk), pos, chunk)
        idxs = jnp.full((chunk,), N, jnp.int32).at[tgt].min(ids, mode="drop")
        valid = idxs < N
        safe = jnp.minimum(idxs, N - 1)
        # ONE packed take for (center uv, running max) of the losers
        qtab = jnp.stack([bc(u0 | (v0 << 16)), max_score], axis=-1)  # (N, 2)
        qrow = jnp.take(qtab, safe, axis=0)
        iu = bci(qrow[:, 0]) & 0xFFFF
        iv = bci(qrow[:, 0]) >> 16
        ms_q = qrow[:, 1]
        scores = _sparse_scores(
            Prows, D21b[safe], iu, iv, span=span, d=d, f=f, w=w, Wp=Wp
        )
        bon = jnp.argmax(scores, axis=-1)
        bsc = jnp.take_along_axis(scores, bon[:, None], axis=-1)[:, 0]
        bi = bon // span
        bj = bon % span
        updq = valid & (bsc > ms_q)
        nu = jnp.where(updq, iu - rd + (bi * d).astype(jnp.int32), iu)
        nv = jnp.where(updq, iv - rd + (bj * d).astype(jnp.int32), iv)
        ns = jnp.where(updq, bsc, ms_q)
        # ONE packed (uv, score) row scatter
        wtab = jnp.stack([bc(nu | (nv << 16)), ns], axis=-1)  # (chunk, 2)
        base = jnp.stack([bc(u_new | (v_new << 16)), max_score], axis=-1)
        out = base.at[idxs].set(wtab, mode="drop")
        uvm = bci(out[:, 0])
        u0 = uvm & 0xFFFF
        v0 = uvm >> 16
        max_score = out[:, 1]
        # losers beyond the chunk budget keep their current match this level;
        # count them so the degradation is observable (no silent caps)
        n_dropped = n_dropped + jnp.sum(
            (active & (pos >= chunk)).astype(jnp.int32)
        )

    return jnp.stack([u0, v0], axis=-1), n_dropped
