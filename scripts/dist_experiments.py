"""Round-5 distance-kernel experiments (VERDICT r4 ask #3).

Measures, on the c2 hull64k fixture:
  * the iteration-count distribution (how many lanes converge by k iters)
  * throughput vs lane width (block 512 / 256 / 128)
  * throughput with a reduced iteration cap (straggler contribution)

Run: python scripts/dist_experiments.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(msg):
    print(msg, flush=True)


def _measure(fn, probe, k):
    import jax.numpy as jnp

    acc = None
    t0 = time.perf_counter()
    for _ in range(k):
        p = probe(fn())
        acc = p if acc is None else acc + p
    float(jnp.sum(acc))
    return time.perf_counter() - t0


def slope_time(fn, probe, k1=10, k2=30, reps=3, warmup=40):
    import jax.numpy as jnp

    float(jnp.sum(probe(fn())))
    for _ in range(warmup):
        probe(fn())
    float(jnp.sum(probe(fn())))
    t1 = min(_measure(fn, probe, k1) for _ in range(reps))
    t2 = min(_measure(fn, probe, k2) for _ in range(reps))
    return max((t2 - t1) / (k2 - k1), 1e-9)


def random_hulls(rng, b, n, spread=0.8, dtype=np.float32):
    v = rng.normal(size=(b, n, 3))
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    v *= 0.5 + 0.5 * rng.random((b, n, 1))
    return (v + rng.normal(size=(b, 1, 3)) * spread).astype(dtype)


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/gjkepa_tpu_jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    import jax.numpy as jnp

    from gjkepa_tpu import GJKEPAConfig
    from gjkepa_tpu.ops.fused import fused_gjk_distance_hulls

    dev = jax.devices()[0]
    log(f"device: {dev} ({dev.platform})")
    cfg = GJKEPAConfig.for_f32()
    rng = np.random.default_rng(0)
    B, N = 65536, 64
    # replicate bench.py's rng stream: c2 consumes hull4k first
    _ = random_hulls(rng, 4096, N), random_hulls(rng, 4096, N)
    p1 = jnp.asarray(random_hulls(rng, B, N))
    p2 = jnp.asarray(random_hulls(rng, B, N))

    r = fused_gjk_distance_hulls(p1, p2, cfg=cfg, block=512)
    it = np.asarray(r.iters)
    log(f"iters: mean {it.mean():.2f} p50 {np.percentile(it,50):.0f} "
        f"p90 {np.percentile(it,90):.0f} p99 {np.percentile(it,99):.0f} "
        f"max {it.max()}")
    hist = np.bincount(np.minimum(it, 40))
    cum = np.cumsum(hist) / it.size
    for k in (4, 6, 8, 10, 12, 16, 20, 24, 32):
        if k < len(cum):
            log(f"  <= {k:2d} iters: {100*cum[k]:6.2f}%")
    inter = float(np.asarray(r.intersecting).mean())
    log(f"intersecting fraction: {inter:.4f}")

    for blk in (512, 256, 128):
        t = slope_time(lambda: fused_gjk_distance_hulls(p1, p2, cfg=cfg,
                                                        block=blk),
                       lambda r: r.distance)
        log(f"block {blk:4d}: {B/t/1e6:6.2f}M q/s ({t*1e6:.0f} us)")

    for cap in (8, 12, 16, 24):
        t = slope_time(lambda: fused_gjk_distance_hulls(p1, p2, cfg=cfg,
                                                        block=512,
                                                        max_iters=cap),
                       lambda r: r.distance)
        log(f"max_iters {cap:3d} (block 512): {B/t/1e6:6.2f}M q/s")


if __name__ == "__main__":
    main()
