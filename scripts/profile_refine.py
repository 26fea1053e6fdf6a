"""Micro-profile of the refine_matches dense cascade internals on the live
backend: dense stencil vs claim/scatter glue vs sparse loser pass, plus
iter_proj. Informs where the next factor of 2 in the matching cascade lives.
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def log(m):
    print(m, file=sys.stderr, flush=True)


def sync(x):
    import jax.numpy as jnp

    return float(jnp.ravel(x)[0])


def timeit(name, fn, out_of, n=8):
    sync(out_of(fn()))
    t0 = time.perf_counter()
    for _ in range(n):
        o = fn()
    sync(out_of(o))
    dt = (time.perf_counter() - t0) / n
    log(f"  {name}: {1000 * dt:.2f} ms")
    return dt


def main():
    import jax
    import jax.numpy as jnp

    from artdeco_tpu.ops import refine_dense as RD
    from artdeco_tpu.utils.cache import setup_compilation_cache

    setup_compilation_cache()
    h, w, f = 288, 512, 24
    n = h * w
    radius, dilation_max = 4, 5
    span = 2 * radius + 1
    rng = np.random.RandomState(0)
    D11 = jnp.asarray(rng.rand(h, w, f).astype(np.float32))
    D21 = jnp.asarray(rng.rand(n, f).astype(np.float32))
    uu, vv = np.meshgrid(np.arange(w), np.arange(h))
    jitter = rng.randint(-6, 7, size=(2, n))
    p1 = jnp.asarray(np.stack(
        [np.clip(uu.reshape(-1) + jitter[0], 1, w - 2),
         np.clip(vv.reshape(-1) + jitter[1], 1, h - 2)], -1
    ).astype(np.int32))

    D11b = D11.astype(jnp.bfloat16)
    D21b = D21.astype(jnp.bfloat16)
    D11T = jnp.transpose(D11b, (2, 0, 1))

    # full cascade
    full = jax.jit(lambda a, b, c: RD.refine_matches_dense_single(
        a, b, c, radius=radius, dilation_max=dilation_max))
    timeit("refine_dense full (5 levels)", lambda: full(D11, D21, p1),
           lambda o: o[0], n=4)

    # dense stencil alone, per level
    for d in (5, 1):
        rd = radius * d

        @jax.jit
        def dense_only(D11T, G3):
            Ppad = jnp.pad(D11T, ((0, 0), (rd, rd), (rd, rd)))
            return RD._dense_best(Ppad, G3, span=span, d=d)

        G3 = D11T  # any (f, h, w)
        timeit(f"_dense_best d={d} (81 offsets)",
               lambda: dense_only(D11T, G3), lambda o: o[0], n=4)

    # claim + packed takes alone (one level's glue, no dense/sparse math)
    @jax.jit
    def glue_only(p1, D21b):
        ids = jnp.arange(n, dtype=jnp.int32)
        u0 = p1[:, 0]
        v0 = p1[:, 1]
        lin = v0 * w + u0
        inv = jnp.full((n,), n, jnp.int32).at[lin].min(ids)
        winner = jnp.minimum(inv, n - 1)
        Grow = jnp.where((inv < n)[:, None], D21b[winner], 0)
        G3 = jnp.transpose(Grow.reshape(h, w, f), (2, 0, 1))
        bc = lambda x: jax.lax.bitcast_convert_type(
            x | jnp.int32(0x40000000), jnp.float32)
        ptab = jnp.stack([bc(inv), bc(inv), bc(inv)], axis=-1)
        prow = jnp.take(ptab, lin, axis=0)
        return G3, prow

    timeit("claim+scatter glue (1 level)", lambda: glue_only(p1, D21b),
           lambda o: o[1], n=8)

    # sparse loser pass alone (one level)
    rd = radius * 5
    Wp = w + 2 * rd
    Prows = jnp.pad(D11b, ((rd, rd), (rd, rd), (0, 0))).reshape(-1, f)
    C = RD._SPARSE_CHUNK
    iu = jnp.asarray(rng.randint(1, w - 2, C).astype(np.int32))
    iv = jnp.asarray(rng.randint(1, h - 2, C).astype(np.int32))
    Dq = D21b[:C]

    @jax.jit
    def sparse_only(Prows, Dq, iu, iv):
        return RD._sparse_scores(Prows, Dq, iu, iv, span=span, d=5, f=f,
                                 w=w, Wp=Wp)

    timeit(f"sparse loser pass (chunk={C})",
           lambda: sparse_only(Prows, Dq, iu, iv), lambda o: o, n=4)

    # iter_proj at production shape
    from artdeco_tpu.ops import matching as M

    X11 = jnp.asarray(rng.rand(1, h, w, 3).astype(np.float32) + 0.5)
    X21 = jnp.asarray(rng.rand(1, h, w, 3).astype(np.float32) + 0.5)
    rwg, ptn, pin = M.prep_for_iter_proj(X11, X21, None)
    rwg.block_until_ready()
    timeit("iter_proj b=1 (10 it, random init)",
           lambda: M.iter_proj(rwg, ptn, pin, max_iter=10),
           lambda o: o[0], n=4)
    init = jnp.broadcast_to(jnp.arange(n), (1, n))
    timeit("iter_proj b=1 (identity init)",
           lambda: M.iter_proj(rwg, ptn, init.astype(jnp.float32).reshape(1, n, 1).repeat(2, -1)
                               if False else M.prep_for_iter_proj(X11, X21, init)[2],
                               max_iter=10)
           if False else M.iter_proj(rwg, ptn, M.prep_for_iter_proj(X11, X21, init)[2], max_iter=10),
           lambda o: o[0], n=4)


if __name__ == "__main__":
    main()
