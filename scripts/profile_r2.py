"""Round-2 profiling: break down fused-pipeline cost on the real TPU.

Timing model for this box (axon tunnel):
  wall(k calls + 1 sync) = k * per_call + per_sync,  per_sync ~ 30-60 ms
and a per-PROGRAM warmup of ~50 calls before per_call stabilizes.
So: warm >= 50 calls, then per_call = (T(k2) - T(k1)) / (k2 - k1), min over
reps — the per-sync constant cancels exactly.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_r2.py [section...]
"""

import functools
import sys
import time

import numpy as np


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


def slope_time(fn, probe, k1=5, k2=25, reps=3, warmup=50):
    """Steady-state per-call seconds; per-sync constant cancels."""
    import jax.numpy as jnp

    float(jnp.sum(probe(fn())))          # compile
    for _ in range(warmup):
        probe(fn())                       # async warm calls
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

    jax.config.update("jax_compilation_cache_dir", "/tmp/gjkepa_tpu_jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from gjkepa_tpu import GJKEPAConfig
    from gjkepa_tpu.models import boxes, capsules, concat_shapes, cylinders, spheres
    from gjkepa_tpu.ops import fused as F

    sections = set(sys.argv[1:]) or {"c2", "c3", "c4"}
    dev = jax.devices()[0]
    log(f"device: {dev} ({dev.platform})")
    cfg = GJKEPAConfig.for_f32()
    rng = np.random.default_rng(0)

    @functools.partial(jax.jit, static_argnames=("c", "block"))
    def gjk_only_hulls(p1, p2, c, block):
        c = F._round_cfg(c)
        b, n1 = p1.shape[0], p1.shape[1]
        n2 = p2.shape[1]
        nb = b // block

        def to_kernel_layout(p, n):
            flat = jnp.swapaxes(p.reshape(nb, block, n * 3), 1, 2)
            return flat.reshape(nb, n, 3, block).swapaxes(1, 2)

        p1t = to_kernel_layout(p1, n1)
        p2t = to_kernel_layout(p2, n2)
        specs = (
            pl.BlockSpec((1, 3, n1, block), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, n2, block), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        )

        def gjk_wrap(p1r, p2r, outr):
            F._gjk_kernel_hulls(p1r.at[0], p2r.at[0], outr.at[0], cfg=c,
                                block=block, use_broadphase=True)

        gout = pl.pallas_call(
            gjk_wrap, grid=(nb,),
            out_shape=jax.ShapeDtypeStruct((nb, 24, block), jnp.float32),
            in_specs=list(specs), out_specs=F._vecspec(24, block),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(p1t, p2t)
        return jnp.swapaxes(gout, 1, 2).reshape(b, 24)

    @functools.partial(jax.jit, static_argnames=("c", "block"))
    def gjk_only_shapes(a, b, c, block):
        c = F._round_cfg(c)
        bsz = a.kind.shape[0]
        nb = bsz // block
        sa = F._pack_shapes(a, nb, block)
        sb = F._pack_shapes(b, nb, block)
        specs = (F._vecspec(16, block), F._vecspec(16, block))

        def gjk_wrap(sar, sbr, outr):
            F._gjk_kernel_shapes(sar.at[0], sbr.at[0], outr.at[0], cfg=c,
                                 block=block)

        gout = pl.pallas_call(
            gjk_wrap, grid=(nb,),
            out_shape=jax.ShapeDtypeStruct((nb, 24, block), jnp.float32),
            in_specs=list(specs), out_specs=F._vecspec(24, block),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(sa, sb)
        return jnp.swapaxes(gout, 1, 2).reshape(bsz, 24)

    def report(name, t, b):
        log(f"{name:38s} {t*1e3:9.3f} ms  ({b/t/1e6:7.2f}M q/s)")

    if "c2" in sections:
        B2, N2 = 4096, 64
        p1 = jnp.asarray(random_hulls(rng, B2, N2))
        p2 = jnp.asarray(random_hulls(rng, B2, N2))
        gjk_cfg = cfg.replace(epa_max_iters=0)
        report("c2 gjk-kernel-only blk512",
               slope_time(lambda: gjk_only_hulls(p1, p2, c=cfg, block=512),
                          lambda r: r[:, 2]), B2)
        report("c2 full epa0 sorted",
               slope_time(lambda: F.fused_gjkepa_hulls(p1, p2, cfg=gjk_cfg,
                                                       block=512),
                          lambda r: r.gjk_iters.astype(jnp.float32)), B2)
        report("c2 full pipeline",
               slope_time(lambda: F.fused_gjkepa_hulls(p1, p2, cfg=cfg,
                                                       block=512),
                          lambda r: r.depth), B2)

    if "c3" in sections:
        B3 = 65536
        q = B3 // 4
        pos = lambda: rng.normal(size=(q, 3)).astype(np.float32) * 1.2  # noqa
        mk = lambda: concat_shapes(  # noqa
            spheres(0.4 + 0.4 * rng.random(q).astype(np.float32), pos=pos()),
            boxes(0.3 + 0.4 * rng.random((q, 3)).astype(np.float32), pos=pos()),
            capsules(0.2 + 0.2 * rng.random(q).astype(np.float32),
                     0.3 + 0.3 * rng.random(q).astype(np.float32), pos=pos()),
            cylinders(0.2 + 0.3 * rng.random(q).astype(np.float32),
                      0.3 + 0.3 * rng.random(q).astype(np.float32), pos=pos()),
        )
        a, b = mk(), mk()
        for blk in (128, 512):
            report(f"c3 gjk-kernel-only blk={blk}",
                   slope_time(lambda: gjk_only_shapes(a, b, c=cfg, block=blk),
                              lambda r: r[:, 2]), B3)
        for blk in (128, 512):
            report(f"c3 full pipeline blk={blk}",
                   slope_time(lambda: F.fused_gjkepa_shapes(a, b, cfg=cfg,
                                                            block=blk),
                              lambda r: r.depth), B3)

    if "c4" in sections:
        B4, N4 = 16384, 24
        big = random_hulls(rng, B4, N4, spread=0.0) * 2.0
        small = random_hulls(rng, B4, N4, spread=0.0) * 0.5
        small += rng.normal(size=(B4, 1, 3)).astype(np.float32) * 0.2
        p41, p42 = jnp.asarray(big), jnp.asarray(small)
        report("c4 gjk-kernel-only blk512",
               slope_time(lambda: gjk_only_hulls(p41, p42, c=cfg, block=512),
                          lambda r: r[:, 2]), B4)
        report("c4 full pipeline blk512",
               slope_time(lambda: F.fused_gjkepa_hulls(p41, p42, cfg=cfg,
                                                       block=512),
                          lambda r: r.depth), B4)


if __name__ == "__main__":
    main()
