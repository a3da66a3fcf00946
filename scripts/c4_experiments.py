"""Round-5 c4 decomposition (VERDICT r4 ask #5): where do the 16k
deep-penetration manifold pipeline's milliseconds go?

  fused        fused_gjkepa_hulls alone (kernels + two-phase glue)
  +derive      gjkepa_batch_fused = fused + derive_contact_rows
  +manifold    deep_manifolds = gjkepa_batch_fused + manifold_batch
  derive only  derive_contact_rows on precomputed results
  manifold only manifold_batch on precomputed results
Also: the 16k sim step uses the same ops — per-stage numbers transfer.

Run: python scripts/c4_experiments.py
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


def slope_time(fn, probe, k1=8, k2=24, reps=3, warmup=30):
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

    from gjkepa_tpu import GJKEPAConfig, manifold_batch
    from gjkepa_tpu.api import derive_contact_batch, gjkepa_batch_fused
    from gjkepa_tpu.ops.contact_rows import derive_contact_rows
    from gjkepa_tpu.ops.fused import fused_gjkepa_hulls

    dev = jax.devices()[0]
    log(f"device: {dev} ({dev.platform})")
    cfg = GJKEPAConfig.for_f32()
    rng = np.random.default_rng(0)
    B4, N4 = 16384, 24
    big = random_hulls(rng, B4, N4, spread=0.0) * 2.0
    small = random_hulls(rng, B4, N4, spread=0.0) * 0.5
    small += rng.normal(size=(B4, 1, 3)).astype(np.float32) * 0.2
    p41, p42 = jnp.asarray(big), jnp.asarray(small)

    t_f = slope_time(lambda: fused_gjkepa_hulls(p41, p42, cfg=cfg, block=512),
                     lambda r: r.depth)
    log(f"fused only       : {t_f*1e6:8.1f} us  ({B4/t_f/1e6:.3f}M q/s)")

    t_fd = slope_time(lambda: gjkepa_batch_fused(p41, p42, cfg=cfg, block=512),
                      lambda r: r.depth)
    log(f"fused + derive   : {t_fd*1e6:8.1f} us  ({B4/t_fd/1e6:.3f}M q/s)"
        f"   [derive marginal {1e6*(t_fd-t_f):7.1f} us]")

    @jax.jit
    def deep_manifolds(a4, b4):
        r = gjkepa_batch_fused(a4, b4, cfg=cfg, block=512)
        return manifold_batch(a4, b4, r.normal, r.depth, r.hit,
                              r.contact_point, cfg=cfg)

    t_fm = slope_time(lambda: deep_manifolds(p41, p42), lambda m: m.depths)
    log(f"fused+der+manif  : {t_fm*1e6:8.1f} us  ({B4/t_fm/1e6:.3f}M q/s)"
        f"   [manifold marginal {1e6*(t_fm-t_fd):7.1f} us]")

    # isolated stages on precomputed inputs
    r = jax.block_until_ready(gjkepa_batch_fused(p41, p42, cfg=cfg,
                                                 block=512))

    @jax.jit
    def derive_only(a4, b4, n):
        return derive_contact_rows(a4, b4, n, cfg)

    t_d = slope_time(lambda: derive_only(p41, p42, r.normal),
                     lambda o: o[1])
    log(f"derive isolated  : {t_d*1e6:8.1f} us")

    @jax.jit
    def manifold_only(a4, b4, n, d, h, c):
        return manifold_batch(a4, b4, n, d, h, c, cfg=cfg)

    t_m = slope_time(lambda: manifold_only(p41, p42, r.normal, r.depth,
                                           r.hit, r.contact_point),
                     lambda m: m.depths)
    log(f"manifold isolated: {t_m*1e6:8.1f} us")

    # version-2 case-tree cost: version 1 skips sort_clock/is_inside
    cfg1 = GJKEPAConfig.for_f32().replace(version=1)

    @jax.jit
    def derive_v1(a4, b4, n):
        return derive_contact_rows(a4, b4, n, cfg1)

    t_d1 = slope_time(lambda: derive_v1(p41, p42, r.normal), lambda o: o[1])
    log(f"derive v1        : {t_d1*1e6:8.1f} us   (case-tree cost "
        f"{1e6*(t_d-t_d1):7.1f} us)")

    # manifold with poly_cap=4 (boxes only need 4)
    @jax.jit
    def manifold_cap4(a4, b4, n, d, h, c):
        return manifold_batch(a4, b4, n, d, h, c, cfg=cfg, poly_cap=4)

    t_m4 = slope_time(lambda: manifold_cap4(p41, p42, r.normal, r.depth,
                                            r.hit, r.contact_point),
                      lambda m: m.depths)
    log(f"manifold cap4    : {t_m4*1e6:8.1f} us")


if __name__ == "__main__":
    main()
