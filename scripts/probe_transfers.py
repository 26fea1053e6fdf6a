"""Probe: do h2d transfers overlap with TPU compute on this backend?

Times (a) a compute loop alone, (b) an h2d upload alone, (c) both together
— if (c) ~= max(a, b), transfers ride a separate DMA path and prefetching
uploads off-thread hides them; if (c) ~= a + b, uploads serialize with
compute and cutting upload BYTES (uint8 images) is the only lever.

Also times uint8 vs float32 upload of a 288x512 image and the device-side
cast, to size the win of uint8 image streaming.
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def log(m):
    print(m, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from artdeco_tpu.utils.cache import setup_compilation_cache

    setup_compilation_cache()

    @jax.jit
    def burn(x, n):
        def body(_, a):
            return a @ a * 0.999

        return jax.lax.fori_loop(0, n, body, x)

    x = jnp.asarray(np.random.rand(2048, 2048).astype(np.float32))
    n = jnp.asarray(64)
    float(burn(x, n)[0, 0])
    t0 = time.perf_counter()
    r = burn(x, n)
    float(r[0, 0])
    t_compute = time.perf_counter() - t0
    log(f"compute alone: {1000 * t_compute:.1f} ms")

    img32 = np.random.rand(3, 288, 512).astype(np.float32)
    img8 = (np.random.rand(288, 512, 3) * 255).astype(np.uint8)

    for name, buf in (("f32 1.8MB", img32), ("u8 0.44MB", img8)):
        # fresh copy each iter so no caching
        ts = []
        for _ in range(6):
            b = buf.copy()
            t0 = time.perf_counter()
            d = jnp.asarray(b)
            d.block_until_ready()
            ts.append(time.perf_counter() - t0)
        log(f"h2d {name} alone: {1000 * np.median(ts):.1f} ms")

    # overlap: dispatch compute, then upload while it runs
    ts = []
    for _ in range(6):
        b = img32.copy()
        t0 = time.perf_counter()
        r = burn(x, n)
        d = jnp.asarray(b)
        d.block_until_ready()
        float(r[0, 0])
        ts.append(time.perf_counter() - t0)
    log(f"compute + f32 h2d together: {1000 * np.median(ts):.1f} ms "
        f"(serialized would be ~{1000 * t_compute + 110:.0f} ms)")

    # device-side u8 -> [-1,1] f32 conversion cost
    @jax.jit
    def u8_to_slam(u):
        f = u.astype(jnp.float32) * (2.0 / 255.0) - 1.0
        return jnp.transpose(f, (2, 0, 1))

    d8 = jnp.asarray(img8)
    u8_to_slam(d8).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(8):
        o = u8_to_slam(d8)
    o.block_until_ready()
    log(f"device u8->slam cast: {1000 * (time.perf_counter() - t0) / 8:.1f} ms")

    # does d2h wait for unrelated queued compute? (queue-order probe)
    small = jnp.ones((8,))
    small.block_until_ready()
    r = burn(x, n)          # enqueue ~t_compute of work
    t0 = time.perf_counter()
    _ = np.asarray(small)   # pull an ALREADY-READY array
    dt = time.perf_counter() - t0
    float(r[0, 0])
    log(f"d2h of ready array while compute queued: {1000 * dt:.1f} ms "
        f"(>{1000 * t_compute * 0.8:.0f} ms means queue-order blocking)")


if __name__ == "__main__":
    main()
