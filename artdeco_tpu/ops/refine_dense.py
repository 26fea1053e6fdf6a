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
    valid: jax.Array = None,  # (n,) bool — queries to refine (None = all)
):
    """See module docstring.  Performance note (measured, v5e): EVERY
    147k-scale random-access op (gather/scatter of any payload) costs
    ~1.4 ms on TPU regardless of byte count, and every lax control-flow
    region in a large live set costs ~4 ms — so this function packs all
    per-level position lookups into single takes.

    ``valid`` gates the search to matches that survived the occlusion
    distance filter: invalid queries keep their position untouched.  Every
    downstream consumer of the match index map masks by the same validity,
    so results are indistinguishable — and the border ring, where
    out-of-view pixels pile up by the thousands (they clamp to [1, w-2]
    and collide), stops flooding the collision-loser pass (BENCH r4
    counted 14.3 M dropped losers, all from these piles).

    Coverage: EXACT.  Collision losers drain through as many fixed-size
    sparse passes as they need (a bounded ``while_loop`` over
    ``_SPARSE_CHUNK``-sized chunks), so ``n_dropped`` — still returned and
    surfaced by the telemetry — can only be nonzero if the loser count
    exceeds chunk * ceil(N / chunk), i.e. never.

    Returns (p_new (n, 2) int32, n_dropped () int32).
    """
    del interpret
    h, w, f = D11.shape
    hw = h * w
    N = p1.shape[0]  # query count; need not equal h*w
    span = 2 * radius + 1
    chunk = min(_SPARSE_CHUNK, N)
    max_passes = -(-N // chunk)

    D11b = D11.astype(jnp.bfloat16)
    D21b = D21.astype(jnp.bfloat16)
    D11T = jnp.transpose(D11b, (2, 0, 1))  # (f, h, w)

    ids = jnp.arange(N, dtype=jnp.int32)
    u0 = p1[:, 0].astype(jnp.int32)
    v0 = p1[:, 1].astype(jnp.int32)
    if valid is None:
        q_ok = jnp.ones((N,), bool)
    else:
        q_ok = valid.reshape(N).astype(bool)
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

        # --- claim: one winner query per center position (lowest id);
        # invalid queries never claim ---
        lin = v0 * w + u0
        lin_claim = jnp.where(q_ok, lin, hw)   # drop: out-of-range target
        inv = jnp.full((hw,), N, jnp.int32).at[lin_claim].min(
            ids, mode="drop")

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
        claimed = (bci(prow[:, 0]) == ids) & q_ok
        bs = prow[:, 1]
        bon = bci(prow[:, 2])
        bi = bon // span
        bj = bon % span
        upd = claimed & (bs > max_score)
        max_score = jnp.where(upd, bs, max_score)
        u_new = jnp.where(upd, u0 - rd + bi * d, u0)
        v_new = jnp.where(upd, v0 - rd + bj * d, v0)

        # --- collision losers: drain in fixed-size sparse passes ---
        Wp = w + 2 * rd
        Prows = jnp.pad(
            D11b, ((rd, rd), (rd, rd), (0, 0))
        ).reshape((h + 2 * rd) * Wp, f)

        active = q_ok & ~claimed
        # full compaction of active ids (cumsum positions, scatter into an
        # N-slot array); the while_loop below walks it chunk by chunk so
        # EVERY loser is processed exactly — no budget, no drops
        pos = jnp.cumsum(active.astype(jnp.int32)) - 1
        n_active = jnp.sum(active.astype(jnp.int32))
        tgt = jnp.where(active, pos, N)
        idxs_full = jnp.full((N,), N, jnp.int32).at[tgt].min(
            ids, mode="drop")
        # packed (center uv, running max) per query, consumed chunk-wise
        qtab = jnp.stack([bc(u0 | (v0 << 16)), max_score], axis=-1)  # (N, 2)
        base = jnp.stack([bc(u_new | (v_new << 16)), max_score], axis=-1)

        def pass_body(state):
            k, out = state
            idxs = jax.lax.dynamic_slice_in_dim(idxs_full, k * chunk, chunk)
            in_range = idxs < N
            safe = jnp.minimum(idxs, N - 1)
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
            updq = in_range & (bsc > ms_q)
            nu = jnp.where(updq, iu - rd + (bi * d).astype(jnp.int32), iu)
            nv = jnp.where(updq, iv - rd + (bj * d).astype(jnp.int32), iv)
            ns = jnp.where(updq, bsc, ms_q)
            wtab = jnp.stack([bc(nu | (nv << 16)), ns], axis=-1)
            out = out.at[idxs].set(wtab, mode="drop")
            return k + 1, out

        def pass_cond(state):
            k, _ = state
            return (k < max_passes) & (k * chunk < n_active)

        _, out = jax.lax.while_loop(pass_cond, pass_body,
                                    (jnp.int32(0), base))
        uvm = bci(out[:, 0])
        u0 = uvm & 0xFFFF
        v0 = uvm >> 16
        max_score = out[:, 1]
        # coverage is exact by construction; the counter stays for the
        # telemetry surface (SURVEY "no silent caps")
        n_dropped = n_dropped + jnp.sum(
            (active & (pos >= chunk * max_passes)).astype(jnp.int32)
        )

    return jnp.stack([u0, v0], axis=-1), n_dropped
