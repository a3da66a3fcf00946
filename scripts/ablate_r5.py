"""Round-5 ablation profiling of the split-pipeline c3 path.

Rather than timing stages in isolation (stage boundaries force
materializations XLA elides in the fused program — measured 10x
overcounting), this copies the `fast` branch of fused_gjkepa_shapes and
times the FULL jitted program with individual pieces ablated.  The delta
full - ablated is that piece's true marginal cost inside the fused
program.

Variants:
  full    the pipeline as shipped
  nocf    closed-form kernel replaced by zeros
  nogjk   subset GJK kernel replaced by zeros
  noepa   EPA kernel + mid glue skipped (boolean-style outputs)
  noout   final (B,12) gather + transpose + merges replaced by row sums
  nopred  grouping predicate/sort replaced by iota (results wrong; cost only)
Also sweeps _SUB_BLOCK (gjk sub-kernel lane width) and the C2 divisor.

Run: python scripts/ablate_r5.py [variants...]
"""

import functools
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
    cparams = F.pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)

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

    @functools.partial(jax.jit, static_argnames=("ablate", "sub_block",
                                                 "c2_div", "group_key",
                                                 "out_opt"))
    def fast_pipeline(a, b, ablate="full", sub_block=None, c2_div=8,
                      group_key=None, out_opt=False):
        bsz = a.kind.shape[0]
        C1 = max(block, (bsz // 4) // block * block)
        gb = min(block, sub_block or F._SUB_BLOCK)
        nbg = C1 // gb
        rup = lambda x: ((x + 7) // 8) * 8  # noqa: E731
        cap = min(F._SMOOTH_EPA_CAP, cfg.epa_max_iters)
        stage_f = rup(max(2 * cap + 10, 48))
        stage_cfg = cfg.replace(epa_max_iters=cap, epa_max_faces=stage_f)
        stages = [(stage_cfg, 8), (stage_cfg, 16)]

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
        iot = jnp.arange(bsz, dtype=jnp.int32)
        if ablate == "nopred":
            dest1 = iot
            order1 = iot
        elif group_key is not None:
            # difficulty grouping WITHIN the g0 subset: sort the g0 lanes
            # by a proxy key so similar-cost lanes share sub-kernel blocks
            # (each block's while loop runs to its slowest lane).
            if group_key == "kind":
                key2 = ka * 4 + kb
            else:  # "gap": quantized relative clearance
                key2 = jnp.clip((gap / jnp.maximum(rr, 1e-6)) * 16.0,
                                0.0, 63.0).astype(jnp.int32)
            primary = jnp.where(g0, jnp.int32(0), jnp.int32(1))
            _, _, order1 = lax.sort((primary, key2, iot), num_keys=2)
            _, dest1 = lax.sort((order1, iot), num_keys=1)
        else:
            gi = g0.astype(jnp.int32)
            csum = jnp.cumsum(gi)
            n_g0 = csum[-1]
            dest1 = jnp.where(g0, csum - 1, n_g0 + iot - csum)
            _, order1 = lax.sort((dest1, iot), num_keys=1)

        rows = jnp.concatenate([F._pack_rows(a), F._pack_rows(b)], axis=1)

        def lanes24(rows48, nblk, blk):
            rt = rows48.T
            sa_ = jnp.swapaxes(rt[:24].reshape(24, nblk, blk), 0, 1)
            sb_ = jnp.swapaxes(rt[24:].reshape(24, nblk, blk), 0, 1)
            return sa_, sb_

        # cf kernel over natural order
        if ablate == "nocf":
            gout_cf = jnp.zeros((nb, F._CF_OUT_ROWS, block), f32)
        else:
            sa_n, sb_n = lanes24(rows, nb, block)

            def cf_wrap(sar, sbr, outr):
                F._cf_kernel_shapes(sar.at[0], sbr.at[0], outr.at[0],
                                    cfg=cfg, block=block)

            gout_cf = pl.pallas_call(
                cf_wrap, grid=(nb,),
                out_shape=jax.ShapeDtypeStruct((nb, F._CF_OUT_ROWS, block),
                                               f32),
                in_specs=[F._vecspec(24, block), F._vecspec(24, block)],
                out_specs=F._vecspec(F._CF_OUT_ROWS, block),
                compiler_params=cparams,
            )(sa_n, sb_n)

        if ablate == "nogjk":
            gout2 = jnp.zeros((nbg, R, gb), f32)
        else:
            sa_g, sb_g = lanes24(rows[order1[:C1]], nbg, gb)

            def sub_wrap(sar, sbr, outr):
                F._gjk_sub_kernel_shapes(sar.at[0], sbr.at[0], outr.at[0],
                                         cfg=cfg, block=gb)

            gout2 = pl.pallas_call(
                sub_wrap, grid=(nbg,),
                out_shape=jax.ShapeDtypeStruct((nbg, R, gb), f32),
                in_specs=[F._vecspec(24, gb), F._vecspec(24, gb)],
                out_specs=F._vecspec(R, gb),
                compiler_params=cparams,
            )(sa_g, sb_g)

        hit2 = gout2[:, 0, :].reshape(C1)
        stat2 = gout2[:, 1, :].reshape(C1)
        iters2 = gout2[:, 2, :].reshape(C1)
        dist2 = gout2[:, 3, :].reshape(C1)
        zc = jnp.zeros((C1,), f32)

        if ablate == "noepa":
            eflat2 = jnp.stack([zc, zc, zc, zc, zc, stat2, zc, zc], axis=1)
        else:
            act2 = hit2 > 0.5
            ai = act2.astype(jnp.int32)
            c2 = jnp.cumsum(ai)
            i2 = jnp.arange(C1, dtype=jnp.int32)
            key = jnp.where(act2, iters2.astype(jnp.int32),
                            jnp.int32(1 << 20))
            _, order2 = lax.sort((key, i2), num_keys=1)
            _, dest2 = lax.sort((order2, i2), num_keys=1)
            gflat2 = jnp.swapaxes(gout2, 1, 2).reshape(C1, R)
            g_perm2 = gflat2[order2]
            enb2 = C1 // eb
            gin2 = jnp.swapaxes(
                g_perm2.reshape(enb2, eb, R), 1, 2)

            def epa_wrap(ginr, outr):
                F._epa_cascade_kernel_shapes(ginr.at[0], outr.at[0],
                                             stages=stages, block=eb)

            def epa_pass(gin_i):
                blocks = gin_i.shape[0]
                eo = pl.pallas_call(
                    epa_wrap, grid=(blocks,),
                    out_shape=jax.ShapeDtypeStruct((blocks, 8, eb), f32),
                    in_specs=[F._vecspec(R, eb)],
                    out_specs=F._vecspec(8, eb),
                    compiler_params=cparams,
                )(gin_i)
                return jnp.swapaxes(eo, 1, 2).reshape(blocks * eb, 8)

            C2 = max(eb, (C1 // c2_div) // eb * eb)
            cblk2 = C2 // eb
            if C2 < C1:
                eflat_c = epa_pass(gin2[:cblk2])

                def tail_pt(_):
                    gs = g_perm2[C2:, 1]
                    z = jnp.zeros((C1 - C2,), f32)
                    return jnp.stack([z, z, z, z, z, gs, z, z], axis=1)

                eflat_tail = lax.cond(c2[-1] > C2,
                                      lambda _: epa_pass(gin2[cblk2:]),
                                      tail_pt, None)
                eflat_p2 = jnp.concatenate([eflat_c, eflat_tail], axis=0)
            else:
                eflat_p2 = epa_pass(gin2)
            eflat2 = eflat_p2[dest2]

        sub = jnp.concatenate(
            [eflat2, hit2[:, None], iters2[:, None], dist2[:, None],
             jnp.zeros((C1, 1), f32)], axis=1)

        if ablate == "noout":
            return sub[:, 0] + gout_cf[:, 0, :].reshape(bsz)[:C1]

        comb = sub[jnp.clip(dest1, 0, C1 - 1)]
        ct = lax.optimization_barrier(comb.T)
        if out_opt:
            # ONE (8, B) relayout of the cf rows, then contiguous row
            # slices — instead of 7 strided (nb, r, block) slice+reshapes
            cf_t = lax.optimization_barrier(
                jnp.swapaxes(gout_cf, 0, 1).reshape(F._CF_OUT_ROWS, bsz))
            cfr = lambda r: cf_t[r]  # noqa: E731
        else:
            cfr = lambda r: gout_cf[:, r, :].reshape(bsz)  # noqa: E731
        zi = jnp.zeros((bsz,), jnp.int32)
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

    def probe(r):
        return r.depth if hasattr(r, "depth") else r

    # sanity: the copy must match the shipped pipeline
    ship = F.fused_gjkepa_shapes(a, b, cfg=cfg, block=block)
    mine = fast_pipeline(a, b)
    ok = bool(jnp.all(ship.hit == mine.hit)
              & jnp.all(jnp.abs(ship.depth - mine.depth) < 1e-6))
    log(f"copy-vs-shipped sanity: {'OK' if ok else 'MISMATCH'}")

    args = sys.argv[1:] or ["full", "nocf", "nogjk", "noepa", "noout",
                            "nopred", "sub256", "sub128", "c2div16"]
    t_full = None
    for v in args:
        if v.startswith("sub"):
            fn = lambda sb=int(v[3:]): fast_pipeline(a, b, sub_block=sb)  # noqa
            name = f"full sub_block={v[3:]}"
        elif v.startswith("c2div"):
            fn = lambda cd=int(v[5:]): fast_pipeline(a, b, c2_div=cd)  # noqa
            name = f"full c2_div={v[5:]}"
        elif v == "outopt":
            fn = lambda: fast_pipeline(a, b, out_opt=True)  # noqa
            name = "full out_opt"
        elif v in ("kindkey", "gapkey"):
            fn = lambda gk=v[:-3]: fast_pipeline(a, b, group_key=gk)  # noqa
            name = f"full group_key={v[:-3]}"
        elif v == "best":
            fn = lambda: fast_pipeline(a, b, out_opt=True, group_key="gap",  # noqa
                                       sub_block=int(os.environ.get(
                                           "ABL_SUB", "256")))
            name = "full best-combo"
        else:
            fn = lambda vv=v: fast_pipeline(a, b, ablate=vv)  # noqa
            name = v
        t = slope_time(fn, probe)
        extra = ""
        if v == "full":
            t_full = t
        elif t_full is not None and v in ("nocf", "nogjk", "noepa", "noout",
                                          "nopred"):
            extra = f"   (marginal {1e6*(t_full-t):8.1f} us)"
        log(f"{name:22s}: {t*1e6:9.1f} us  ({B/t/1e6:6.2f}M q/s){extra}")


if __name__ == "__main__":
    main()
