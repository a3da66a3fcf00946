"""Round-5 profiling: decompose the SPLIT-pipeline c3 path (the round-4
`fast` branch of fused_gjkepa_shapes) stage by stage, with steady-state
slope timing, so the round-5 headline work attacks measured numbers.

Stages (mirroring ops/fused.py fused_gjkepa_shapes `fast`):

  A  predicate glue : kind masks + radius/gap + cumsum + dest1/order1 sort
  A2 pack rows      : _pack_rows x2 + concat -> (B, 48)
  B0 cf kernel      : closed-form kernel over the natural order (nb blocks)
  B1 subset gather  : rows[order1[:C1]] + lanes24g transposes
  B2 gjk sub kernel : compact-subset GJK kernel (C1 lanes)
  C  mid glue       : reshapes + hit-compaction sort + g_perm2 gather + gin
  D  EPA kernel     : compact pass on C2 lanes (+ tail cond not timed)
  E  out glue       : eflat[dest2] + sub concat + (B,12) gather + transpose
  full              : fused_gjkepa_shapes end to end

Run: python scripts/profile_r5.py
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
    R = F._SHAPE_OUT_ROWS
    f32 = jnp.float32

    def mk3(seed_rng):
        pos = lambda: seed_rng.normal(size=(q, 3)).astype(np.float32) * 1.2  # noqa
        return concat_shapes(
            spheres(0.4 + 0.4 * seed_rng.random(q).astype(np.float32), pos=pos()),
            boxes(0.3 + 0.4 * seed_rng.random((q, 3)).astype(np.float32), pos=pos()),
            capsules(0.2 + 0.2 * seed_rng.random(q).astype(np.float32),
                     0.3 + 0.3 * seed_rng.random(q).astype(np.float32), pos=pos()),
            cylinders(0.2 + 0.3 * seed_rng.random(q).astype(np.float32),
                      0.3 + 0.3 * seed_rng.random(q).astype(np.float32), pos=pos()),
        )

    a, b = mk3(rng), mk3(rng)

    t_full = slope_time(
        lambda: F.fused_gjkepa_shapes(a, b, cfg=cfg, block=block),
        lambda r: r.depth)
    log(f"full pipeline          : {t_full*1e6:9.1f} us  "
        f"({B/t_full/1e6:.2f}M q/s)")

    C1 = max(block, (B // 4) // block * block)
    gb = min(block, F._SUB_BLOCK)
    nbg = C1 // gb
    log(f"(B={B} block={block} C1={C1} gb={gb} nbg={nbg})")

    # ---- stage A: predicate + grouping sort --------------------------------
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
            p = s.params.astype(f32)
            rbox = jnp.sqrt(jnp.sum(p * p, axis=1))
            return jnp.where(s.kind == 0, p[:, 0],
                             jnp.where(s.kind == 1, rbox, p[:, 0] + p[:, 1]))

        gap = jnp.sqrt(jnp.sum((a.pos.astype(f32) - b.pos.astype(f32)) ** 2,
                               axis=1))
        rr = radius(a) + radius(b) + cfg.broadphase_tol
        g0 = (gap <= rr + 1e-4 + 1e-4 * jnp.abs(rr)) & ~cf
        gi = g0.astype(jnp.int32)
        csum = jnp.cumsum(gi)
        n_g0 = csum[-1]
        iot = jnp.arange(bsz, dtype=jnp.int32)
        dest1 = jnp.where(g0, csum - 1, n_g0 + iot - csum)
        _, order1 = lax.sort((dest1, iot), num_keys=1)
        return g0, dest1, order1, n_g0

    t_a = slope_time(lambda: stage_a(a, b), lambda r: r[1])
    g0, dest1, order1, n_g0 = jax.block_until_ready(stage_a(a, b))
    log(f"A predicate+sort       : {t_a*1e6:9.1f} us   (n_g0 = {int(n_g0)})")

    # ---- stage A2: pack rows ----------------------------------------------
    @jax.jit
    def stage_a2(a, b):
        return jnp.concatenate([F._pack_rows(a), F._pack_rows(b)], axis=1)

    t_a2 = slope_time(lambda: stage_a2(a, b), lambda r: r[:, 0])
    rows = jax.block_until_ready(stage_a2(a, b))
    log(f"A2 pack rows (B,48)    : {t_a2*1e6:9.1f} us")

    # ---- stage B0: cf kernel over natural order ----------------------------
    cparams = F.pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)

    @jax.jit
    def stage_b0(rows):
        rt = rows.T
        sa_ = jnp.swapaxes(rt[:24].reshape(24, nb, block), 0, 1)
        sb_ = jnp.swapaxes(rt[24:].reshape(24, nb, block), 0, 1)

        def cf_wrap(sar, sbr, outr):
            F._cf_kernel_shapes(sar.at[0], sbr.at[0], outr.at[0], cfg=cfg,
                                block=block)

        return pl.pallas_call(
            cf_wrap, grid=(nb,),
            out_shape=jax.ShapeDtypeStruct((nb, F._CF_OUT_ROWS, block), f32),
            in_specs=[F._vecspec(24, block), F._vecspec(24, block)],
            out_specs=F._vecspec(F._CF_OUT_ROWS, block),
            compiler_params=cparams,
        )(sa_, sb_)

    t_b0 = slope_time(lambda: stage_b0(rows), lambda r: r[:, 0, :])
    gout_cf = jax.block_until_ready(stage_b0(rows))
    log(f"B0 cf kernel ({nb}x{block})  : {t_b0*1e6:9.1f} us")

    # (B0 includes the lanes24 transposes; isolate them)
    @jax.jit
    def b0_transposes(rows):
        rt = rows.T
        sa_ = jnp.swapaxes(rt[:24].reshape(24, nb, block), 0, 1)
        sb_ = jnp.swapaxes(rt[24:].reshape(24, nb, block), 0, 1)
        return sa_, sb_

    t_b0t = slope_time(lambda: b0_transposes(rows), lambda r: r[0][:, 0, :])
    log(f"  B0.t lanes24 transposes   : {t_b0t*1e6:8.1f} us")

    # ---- stage B1: subset gather + transposes ------------------------------
    @jax.jit
    def stage_b1(rows, order1):
        sub_rows = rows[order1[:C1]]
        rt = sub_rows.T
        sa_ = jnp.swapaxes(rt[:24].reshape(24, nbg, gb), 0, 1)
        sb_ = jnp.swapaxes(rt[24:].reshape(24, nbg, gb), 0, 1)
        return sa_, sb_

    t_b1 = slope_time(lambda: stage_b1(rows, order1), lambda r: r[0][:, 0, :])
    sa_g, sb_g = jax.block_until_ready(stage_b1(rows, order1))
    log(f"B1 subset gather+t     : {t_b1*1e6:9.1f} us   (C1={C1})")

    # ---- stage B2: gjk sub kernel ------------------------------------------
    @jax.jit
    def stage_b2(sa_g, sb_g):
        def sub_wrap(sar, sbr, outr):
            F._gjk_sub_kernel_shapes(sar.at[0], sbr.at[0], outr.at[0],
                                     cfg=cfg, block=gb)

        return pl.pallas_call(
            sub_wrap, grid=(nbg,),
            out_shape=jax.ShapeDtypeStruct((nbg, R, gb), f32),
            in_specs=[F._vecspec(24, gb), F._vecspec(24, gb)],
            out_specs=F._vecspec(R, gb),
            compiler_params=cparams,
        )(sa_g, sb_g)

    t_b2 = slope_time(lambda: stage_b2(sa_g, sb_g), lambda r: r[:, 0, :])
    gout2 = jax.block_until_ready(stage_b2(sa_g, sb_g))
    log(f"B2 gjk sub kernel      : {t_b2*1e6:9.1f} us   ({nbg}x{gb})")

    # ---- stage C: mid glue --------------------------------------------------
    rup = lambda x: ((x + 7) // 8) * 8  # noqa: E731
    cap = min(F._SMOOTH_EPA_CAP, cfg.epa_max_iters)
    stage_f = rup(max(2 * cap + 10, 48))
    stage_cfg = cfg.replace(epa_max_iters=cap, epa_max_faces=stage_f)
    stages = [(stage_cfg, 8), (stage_cfg, 16)]
    enb2 = C1 // eb
    C2 = max(eb, (C1 // 8) // eb * eb)
    cblk2 = C2 // eb

    @jax.jit
    def stage_c(gout2):
        hit2 = gout2[:, 0, :].reshape(C1)
        iters2 = gout2[:, 2, :].reshape(C1)
        act2 = hit2 > 0.5
        ai = act2.astype(jnp.int32)
        c2 = jnp.cumsum(ai)
        i2 = jnp.arange(C1, dtype=jnp.int32)
        key = jnp.where(act2, iters2.astype(jnp.int32), jnp.int32(1 << 20))
        _, order2 = lax.sort((key, i2), num_keys=1)
        _, dest2 = lax.sort((order2, i2), num_keys=1)
        gflat2 = jnp.swapaxes(gout2, 1, 2).reshape(C1, R)
        g_perm2 = gflat2[order2]
        gin2 = jnp.swapaxes(g_perm2.reshape(enb2, eb, R), 1, 2)
        return gin2, dest2, g_perm2, c2[-1]

    t_c = slope_time(lambda: stage_c(gout2), lambda r: r[0][:, 0, :])
    gin2, dest2, g_perm2, n_act = jax.block_until_ready(stage_c(gout2))
    log(f"C mid glue             : {t_c*1e6:9.1f} us   (n_act = {int(n_act)})")

    # ---- stage D: EPA kernel on C2 lanes ------------------------------------
    def epa_wrap(ginr, outr):
        F._epa_cascade_kernel_shapes(ginr.at[0], outr.at[0], stages=stages,
                                     block=eb)

    @jax.jit
    def stage_d(gin2):
        return pl.pallas_call(
            epa_wrap, grid=(cblk2,),
            out_shape=jax.ShapeDtypeStruct((cblk2, 8, eb), f32),
            in_specs=[F._vecspec(R, eb)],
            out_specs=F._vecspec(8, eb),
            compiler_params=cparams,
        )(gin2[:cblk2])

    t_d = slope_time(lambda: stage_d(gin2), lambda r: r[:, 0, :])
    eo = jax.block_until_ready(stage_d(gin2))
    log(f"D EPA kernel (C2={C2})  : {t_d*1e6:9.1f} us   ({cblk2}x{eb})")

    # ---- stage E: out glue --------------------------------------------------
    @jax.jit
    def stage_e(eo, g_perm2, dest2, gout2, gout_cf, dest1, g0):
        eflat_c = jnp.swapaxes(eo, 1, 2).reshape(C2, 8)
        gs = g_perm2[C2:, 1]
        z = jnp.zeros((C1 - C2,), f32)
        eflat_tail = jnp.stack([z, z, z, z, z, gs, z, z], axis=1)
        eflat_p2 = jnp.concatenate([eflat_c, eflat_tail], axis=0)
        eflat2 = eflat_p2[dest2]
        hit2 = gout2[:, 0, :].reshape(C1)
        iters2 = gout2[:, 2, :].reshape(C1)
        dist2 = gout2[:, 3, :].reshape(C1)
        sub = jnp.concatenate(
            [eflat2, hit2[:, None], iters2[:, None], dist2[:, None],
             jnp.zeros((C1, 1), f32)], axis=1)
        comb = sub[jnp.clip(dest1, 0, C1 - 1)]
        ct = lax.optimization_barrier(comb.T)
        cfr = lambda r: gout_cf[:, r, :].reshape(B)  # noqa: E731
        zi = jnp.zeros((B,), jnp.int32)
        return F.FusedResult(
            hit=jnp.where(g0, ct[8] > 0.5, cfr(0) > 0.5),
            status=jnp.where(g0, ct[5], cfr(1)).astype(jnp.int32),
            depth=jnp.where(g0, ct[0], cfr(2)),
            normal=jnp.stack([jnp.where(g0, ct[1], cfr(3)),
                              jnp.where(g0, ct[2], cfr(4)),
                              jnp.where(g0, ct[3], cfr(5))], axis=1),
            gjk_iters=jnp.where(g0, ct[9].astype(jnp.int32), zi),
            epa_iters=jnp.where(g0, ct[4].astype(jnp.int32), zi),
            distance=jnp.where(g0, ct[10], cfr(6)),
        )

    t_e = slope_time(
        lambda: stage_e(eo, g_perm2, dest2, gout2, gout_cf, dest1, g0),
        lambda r: r.depth)
    log(f"E out glue             : {t_e*1e6:9.1f} us")

    total = t_a + t_a2 + t_b0 + t_b1 + t_b2 + t_c + t_d + t_e
    log(f"sum of stages          : {total*1e6:9.1f} us vs full "
        f"{t_full*1e6:.1f} us")
    log("note: stage boundaries force materialization XLA may elide when "
        "fused end to end; treat stage times as upper bounds, the full "
        "time as truth.")


if __name__ == "__main__":
    main()
