"""Round-3 profiling: where do the c3 (64k mixed analytic) 3.25 ms go?

Components timed (same slope methodology as profile_r2.py):
  - gjk-kernel-only      : pack + the one GJK pallas_call (56-row out)
  - epa0 pipeline        : full driver with epa_max_iters=0 (no EPA dispatch)
  - full pipeline        : GJK + sort + EPA cascade + merge
  - full, sort_hits=False: isolates the hit-compaction permutes

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_r3.py
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
    import jax.numpy as jnp

    float(jnp.sum(probe(fn())))
    for _ in range(warmup):
        probe(fn())
    float(jnp.sum(probe(fn())))
    t1 = min(_measure(fn, probe, k1) for _ in range(reps))
    t2 = min(_measure(fn, probe, k2) for _ in range(reps))
    return max((t2 - t1) / (k2 - k1), 1e-9)


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

    dev = jax.devices()[0]
    log(f"device: {dev} ({dev.platform})")
    cfg = GJKEPAConfig.for_f32()
    rng = np.random.default_rng(0)

    @functools.partial(jax.jit, static_argnames=("c", "block"))
    def gjk_only_shapes(a, b, c, block):
        c = F._round_cfg(c)
        bsz = a.kind.shape[0]
        nb = bsz // block
        sa = F._pack_shapes(a, nb, block)
        sb = F._pack_shapes(b, nb, block)
        specs = (F._vecspec(24, block), F._vecspec(24, block))
        R = F._SHAPE_OUT_ROWS

        def gjk_wrap(sar, sbr, outr):
            F._gjk_kernel_shapes(sar.at[0], sbr.at[0], outr.at[0], cfg=c,
                                 block=block)

        gout = pl.pallas_call(
            gjk_wrap, grid=(nb,),
            out_shape=jax.ShapeDtypeStruct((nb, R, block), jnp.float32),
            in_specs=list(specs), out_specs=F._vecspec(R, block),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(sa, sb)
        return jnp.swapaxes(gout, 1, 2).reshape(bsz, R)

    def report(name, t, b):
        log(f"{name:40s} {t*1e3:9.3f} ms  ({b/t/1e6:7.2f}M q/s)")

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
    gjk_cfg = cfg.replace(epa_max_iters=0)
    sections = set(sys.argv[1:]) or {"kern", "epa0", "full", "nosort"}
    if "kern" in sections:
        report("c3 gjk-kernel-only blk512",
               slope_time(lambda: gjk_only_shapes(a, b, c=cfg, block=512),
                          lambda r: r[:, 2]), B3)
    if "epa0" in sections:
        report("c3 epa0 pipeline blk512",
               slope_time(lambda: F.fused_gjkepa_shapes(a, b, cfg=gjk_cfg,
                                                        block=512),
                          lambda r: r.depth), B3)
    if "full" in sections:
        report("c3 full pipeline blk512",
               slope_time(lambda: F.fused_gjkepa_shapes(a, b, cfg=cfg,
                                                        block=512),
                          lambda r: r.depth), B3)
    if "nosort" in sections:
        report("c3 full pipeline blk512 sort=off",
               slope_time(lambda: F.fused_gjkepa_shapes(a, b, cfg=cfg,
                                                        block=512,
                                                        sort_hits=False),
                          lambda r: r.depth), B3)


if __name__ == "__main__":
    main()
