"""Round-4 profiling: decompose the c3 (64k mixed analytic) pipeline.

The round-3 budget said kernels ~1.05 ms vs glue ~1.2 ms per 64k call.
This script times each stage with steady-state slope timing so the
round-4 glue work attacks the real numbers:

  stage A  pack-in glue : _pack_rows x2 + grouping sort + gather + transposes
  stage B  GJK kernel   : the one pallas_call on pre-packed blocks
  stage C  mid glue     : gflat transpose + cumsum/sort + row gather + gin transpose
  stage D  EPA kernel   : compact pass on the leading C lanes
  stage E  out glue     : dest gather + pre_dest gather + result slices
  full     fused_gjkepa_shapes end to end

Run: python scripts/profile_r4.py
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


def slope_time(fn, probe, k1=10, k2=50, reps=3, warmup=50):
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

    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/gjkepa_tpu_jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl

    from gjkepa_tpu import GJKEPAConfig
    from gjkepa_tpu.models import (boxes, capsules, concat_shapes, cylinders,
                                   spheres)
    from gjkepa_tpu.ops import fused as F

    dev = jax.devices()[0]
    log(f"device: {dev} ({dev.platform})")
    cfg = F._round_cfg(GJKEPAConfig.for_f32())
    rng = np.random.default_rng(0)

    B = 65536
    q = B // 4
    block = 512
    nb = B // block
    eb = 128
    enb = B // eb
    R = F._SHAPE_OUT_ROWS

    def mk3(seed_rng):
        pos = lambda: seed_rng.normal(size=(q, 3)).astype(np.float32) * 1.2
        return concat_shapes(
            spheres(0.4 + 0.4 * seed_rng.random(q).astype(np.float32), pos=pos()),
            boxes(0.3 + 0.4 * seed_rng.random((q, 3)).astype(np.float32), pos=pos()),
            capsules(0.2 + 0.2 * seed_rng.random(q).astype(np.float32),
                     0.3 + 0.3 * seed_rng.random(q).astype(np.float32), pos=pos()),
            cylinders(0.2 + 0.3 * seed_rng.random(q).astype(np.float32),
                      0.3 + 0.3 * seed_rng.random(q).astype(np.float32), pos=pos()),
        )

    a, b = mk3(rng), mk3(rng)

    # ---- full pipeline ------------------------------------------------------
    t_full = slope_time(
        lambda: F.fused_gjkepa_shapes(a, b, cfg=cfg, block=block),
        lambda r: r.depth)
    log(f"full pipeline          : {t_full*1e6:9.1f} us  ({B/t_full/1e6:.2f}M q/s)")

    # ---- stage A: pack-in glue ---------------------------------------------
    @jax.jit
    def stage_a(a, b):
        bsz = a.kind.shape[0]
        ka = a.kind.astype(jnp.int32)
        kb = b.kind.astype(jnp.int32)
        sw_a = (ka == 0) | (ka == 2)
        sw_b = (kb == 0) | (kb == 2)
        cf = (sw_a & sw_b) | ((ka == 1) & (kb == 1))
        cf |= ((ka == 0) & (kb == 1)) | ((ka == 1) & (kb == 0))
        cf |= ((ka == 0) & (kb == 3)) | ((ka == 3) & (kb == 0))

        def radius(s):
            p = s.params.astype(jnp.float32)
            rbox = jnp.sqrt(jnp.sum(p * p, axis=1))
            return jnp.where(s.kind == 0, p[:, 0],
                             jnp.where(s.kind == 1, rbox, p[:, 0] + p[:, 1]))

        gap = jnp.sqrt(jnp.sum((a.pos.astype(jnp.float32)
                                - b.pos.astype(jnp.float32)) ** 2, axis=1))
        g0 = (gap <= radius(a) + radius(b) + cfg.broadphase_tol) & ~cf
        gi = g0.astype(jnp.int32)
        csum = jnp.cumsum(gi)
        iot = jnp.arange(bsz, dtype=jnp.int32)
        dest1 = jnp.where(g0, csum - 1, csum[-1] + iot - csum)
        _, order1 = lax.sort((dest1, iot), num_keys=1)
        rows = jnp.concatenate([F._pack_rows(a), F._pack_rows(b)], axis=1)
        rows = rows[order1]
        rows_t = rows.T
        sa = jnp.swapaxes(rows_t[:24].reshape(24, nb, block), 0, 1)
        sb = jnp.swapaxes(rows_t[24:].reshape(24, nb, block), 0, 1)
        return sa, sb, dest1

    t_a = slope_time(lambda: stage_a(a, b), lambda r: r[0][:, 0, :])
    log(f"A pack-in glue         : {t_a*1e6:9.1f} us")

    sa, sb, dest1 = jax.block_until_ready(stage_a(a, b))

    # ---- stage B: GJK pallas pass -------------------------------------------
    def gjk_wrap(sar, sbr, outr):
        F._gjk_kernel_shapes(sar.at[0], sbr.at[0], outr.at[0], cfg=cfg,
                             block=block)

    @jax.jit
    def stage_b(sa, sb):
        return pl.pallas_call(
            gjk_wrap, grid=(nb,),
            out_shape=jax.ShapeDtypeStruct((nb, R, block), jnp.float32),
            in_specs=[F._vecspec(24, block), F._vecspec(24, block)],
            out_specs=F._vecspec(R, block),
        )(sa, sb)

    t_b = slope_time(lambda: stage_b(sa, sb), lambda g: g[:, 0, :])
    log(f"B GJK kernel           : {t_b*1e6:9.1f} us")

    gout = jax.block_until_ready(stage_b(sa, sb))

    # ---- stage C: mid glue (transpose + sort + gather + transpose) ----------
    @jax.jit
    def stage_c(gout):
        gflat = jnp.swapaxes(gout, 1, 2).reshape(B, R)
        hit = gflat[:, 0] > 0.5
        final = gflat[:, 16] > 0.5
        epa_act = hit & ~final
        act_i = epa_act.astype(jnp.int32)
        c = jnp.cumsum(act_i)
        i = jnp.arange(B, dtype=jnp.int32)
        dest = jnp.where(epa_act, c - 1, c[-1] + i - c)
        _, order = lax.sort((dest, i), num_keys=1)
        g_perm = gflat[order]
        gin = jnp.swapaxes(g_perm.reshape(enb, eb, R), 1, 2)
        return gin, dest, g_perm, c[-1]

    t_c = slope_time(lambda: stage_c(gout), lambda r: r[0][:, 0, :])
    log(f"C mid glue             : {t_c*1e6:9.1f} us")

    gin, dest, g_perm, n_act = jax.block_until_ready(stage_c(gout))
    log(f"  (n_act = {int(n_act)})")

    # sub-measure C pieces
    @jax.jit
    def c1_transpose(gout):
        return jnp.swapaxes(gout, 1, 2).reshape(B, R)

    t_c1 = slope_time(lambda: c1_transpose(gout), lambda g: g[:, 0])
    log(f"  C.1 gout->gflat transpose : {t_c1*1e6:8.1f} us")

    gflat = jax.block_until_ready(c1_transpose(gout))

    @jax.jit
    def c2_sort(gflat):
        hit = gflat[:, 0] > 0.5
        final = gflat[:, 16] > 0.5
        epa_act = hit & ~final
        act_i = epa_act.astype(jnp.int32)
        c = jnp.cumsum(act_i)
        i = jnp.arange(B, dtype=jnp.int32)
        dest = jnp.where(epa_act, c - 1, c[-1] + i - c)
        _, order = lax.sort((dest, i), num_keys=1)
        return dest, order

    t_c2 = slope_time(lambda: c2_sort(gflat), lambda r: r[0])
    log(f"  C.2 cumsum+sort           : {t_c2*1e6:8.1f} us")

    dest_, order_ = jax.block_until_ready(c2_sort(gflat))

    @jax.jit
    def c3_gather(gflat, order):
        return gflat[order]

    t_c3 = slope_time(lambda: c3_gather(gflat, order_), lambda g: g[:, 0])
    log(f"  C.3 row gather (B x {R})  : {t_c3*1e6:8.1f} us")

    @jax.jit
    def c4_gin(g_perm):
        return jnp.swapaxes(g_perm.reshape(enb, eb, R), 1, 2)

    t_c4 = slope_time(lambda: c4_gin(g_perm), lambda g: g[:, 0, :])
    log(f"  C.4 gflat->gin transpose  : {t_c4*1e6:8.1f} us")

    # compact-only variants
    C = max(eb, (B // 8) // eb * eb)
    cblk = C // eb

    @jax.jit
    def c3_gather_compact(gflat, order):
        return gflat[order[:C]]

    t_c3c = slope_time(lambda: c3_gather_compact(gflat, order_),
                       lambda g: g[:, 0])
    log(f"  C.3' compact row gather ({C} x {R}): {t_c3c*1e6:8.1f} us")

    # ---- stage D: EPA pass on compact lanes ----------------------------------
    rup = lambda x: ((x + 7) // 8) * 8
    cap = min(F._SMOOTH_EPA_CAP, cfg.epa_max_iters)
    stage_f = rup(max(2 * cap + 10, 48))
    stage_cfg = cfg.replace(epa_max_iters=cap, epa_max_faces=stage_f)
    stages = [(stage_cfg, 8), (stage_cfg, 16)]

    def epa_wrap(ginr, outr):
        F._epa_cascade_kernel_shapes(ginr.at[0], outr.at[0], stages=stages,
                                     block=eb)

    @jax.jit
    def stage_d(gin):
        return pl.pallas_call(
            epa_wrap, grid=(cblk,),
            out_shape=jax.ShapeDtypeStruct((cblk, 8, eb), jnp.float32),
            in_specs=[F._vecspec(R, eb)],
            out_specs=F._vecspec(8, eb),
        )(gin[:cblk])

    t_d = slope_time(lambda: stage_d(gin), lambda e: e[:, 0, :])
    log(f"D EPA kernel (compact) : {t_d*1e6:9.1f} us")

    eo = jax.block_until_ready(stage_d(gin))

    # ---- stage E: out glue ----------------------------------------------------
    @jax.jit
    def stage_e(eo, g_perm, gflat, dest, dest1):
        eflat_c = jnp.swapaxes(eo, 1, 2).reshape(C, 8)
        fin = g_perm[C:, 16] > 0.5
        z = jnp.zeros((B - C,), jnp.float32)
        tail = jnp.stack(
            [jnp.where(fin, g_perm[C:, 17], 0.0),
             jnp.where(fin, g_perm[C:, 18], 0.0),
             jnp.where(fin, g_perm[C:, 19], 0.0),
             jnp.where(fin, g_perm[C:, 20], 0.0),
             z, g_perm[C:, 1], z, z], axis=1)
        eflat_p = jnp.concatenate([eflat_c, tail], axis=0)
        eflat = eflat_p[dest]
        comb = jnp.concatenate([eflat, gflat[:, :4]], axis=1)[dest1]
        return comb

    t_e = slope_time(lambda: stage_e(eo, g_perm, gflat, dest, dest1),
                     lambda r: r[:, 0])
    log(f"E out glue             : {t_e*1e6:9.1f} us")

    total = t_a + t_b + t_c + t_d + t_e
    log(f"sum of stages          : {total*1e6:9.1f} us vs full {t_full*1e6:.1f} us")


if __name__ == "__main__":
    main()
