"""Benchmark harness: the five BASELINE.json configs on real hardware.

Prints ONE JSON line to stdout:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, "configs": {...}}

Headline metric = GJK+EPA pair queries/sec on the 64k mixed analytic-shape
batch (config 3), matching BASELINE.json's "pair queries/sec at 64k batch".
vs_baseline is measured against the 50M q/s north-star target (the
reference publishes no numbers of its own — BASELINE.md).

Timing methodology (measured properties of this box's axon tunnel):
  - `block_until_ready` does not reliably block; the only safe sync is a
    host read of a scalar reduction of the results.
  - wall(K calls + 1 sync) = K * per_call + noise, where the noise term
    (sync + pipeline-fill effects) fluctuates by tens of ms run-to-run.
  - every program has a per-PROGRAM warmup of ~30-50 calls before per_call
    stabilizes (first calls read 5-40x high).
So each measurement (a) warms the program with async calls, then (b) times
runs of K and 2K calls (min over repeats), doubling K until the differenced
window (T(2K)-T(K)) is >= 250 ms, and reports (T(2K)-T(K))/K — the noise
term cancels in the difference and is <4% of the window.  This is the
steady-state per-call cost, i.e. what a pipelined caller pays per batch.

Run directly on the TPU (no platform override).  Detail lines go to stderr.
Dev A/B mode: `python bench.py c3 c2` times only those config prefixes.
"""

import contextlib
import json
import os
import sys
import time

import numpy as np


def log(msg):
    print(msg, file=sys.stderr, flush=True)


@contextlib.contextmanager
def profile_scope(name):
    """jax.profiler trace hook (SURVEY.md §5.1).

    Off by default; set GJKEPA_PROFILE=<dir> to capture one XLA/TPU trace
    per bench config under <dir>/<config-name> (viewable with
    tensorboard / xprof).  Wraps a handful of post-warmup calls only, so
    the trace shows steady-state programs, not compiles.
    """
    d = os.environ.get("GJKEPA_PROFILE", "")
    if not d:
        yield False
        return
    import jax

    path = os.path.join(d, name)
    os.makedirs(path, exist_ok=True)
    with jax.profiler.trace(path):
        yield True
    log(f"profile: wrote {name} trace to {path}")


def _run(fn, probe, k):
    import jax.numpy as jnp

    acc = None
    t0 = time.perf_counter()
    for _ in range(k):
        p = probe(fn())
        acc = p if acc is None else acc + p
    float(jnp.sum(acc))  # the single host sync
    return time.perf_counter() - t0


def timeit(fn, probe, reps=3, warmup=30, min_window_s=0.4, k0=4, kmax=4096):
    """Steady-state per-call seconds of fn() (adaptive differencing; see
    module docstring).

    `probe(result)` maps a result to an array that is accumulated and
    reduced to one host scalar (the only sync point per run).
    """
    import jax.numpy as jnp

    float(jnp.sum(probe(fn())))  # compile + sync
    for _ in range(warmup):
        probe(fn())              # async per-program warmup
    float(jnp.sum(probe(fn())))
    k = k0
    t_a = min(_run(fn, probe, k) for _ in range(reps))
    while True:
        t_b = min(_run(fn, probe, 2 * k) for _ in range(reps))
        if (t_b - t_a) >= min_window_s or 2 * k >= kmax:
            return max((t_b - t_a) / k, 1e-9)
        k *= 2
        t_a = t_b


def maybe_profile(name, fn, probe, calls=5):
    """Capture a steady-state device trace of fn (no-op unless
    GJKEPA_PROFILE is set — see profile_scope)."""
    import jax.numpy as jnp

    with profile_scope(name) as on:
        if on:
            acc = None
            for _ in range(calls):
                p = probe(fn())
                acc = p if acc is None else acc + p
            float(jnp.sum(acc))


def random_hulls(rng, b, n, spread=0.8, dtype=np.float32):
    v = rng.normal(size=(b, n, 3))
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    v *= 0.5 + 0.5 * rng.random((b, n, 1))
    return (v + rng.normal(size=(b, 1, 3)) * spread).astype(dtype)


def main():
    import jax

    # Optional config filter for development A/B runs: `python bench.py c3
    # c2` times only those configs (c1..c6 prefixes).  No args (the driver
    # invocation) runs everything — output contract unchanged.
    only = {a for a in sys.argv[1:] if a.startswith("c")}
    want = lambda tag: (not only) or tag in only  # noqa: E731

    # persistent compile cache: the masked while-loop programs are
    # compile-heavy; cache across bench runs/rounds
    jax.config.update("jax_compilation_cache_dir", "/tmp/gjkepa_tpu_jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    import jax.numpy as jnp

    from gjkepa_tpu import GJKEPAConfig, gjkepa
    from gjkepa_tpu.models import boxes, capsules, concat_shapes, cylinders, spheres
    from gjkepa_tpu.ops.fused import fused_gjkepa_hulls, fused_gjkepa_shapes

    dev = jax.devices()[0]
    log(f"device: {dev} ({dev.platform})")
    cfg = GJKEPAConfig.for_f32()
    rng = np.random.default_rng(0)
    results = {}

    # ---- config 1: single pair cube-vs-cube (latency) ---------------------
    if want("c1"):
        half = 0.5
        corners = np.array([[x, y, z] for x in (-half, half)
                            for y in (-half, half)
                            for z in (-half, half)], np.float32)
        c1 = jnp.asarray(corners)
        c2 = jnp.asarray(corners + np.array([0.5, 0, 0], np.float32))
        t = timeit(lambda: gjkepa(c1, c2, cfg=cfg), lambda r: r.depth, reps=4)
        r = gjkepa(c1, c2, cfg=cfg)
        assert bool(r.hit) and abs(float(r.depth) - 0.5) < 1e-4, (
            float(r.depth), int(r.status))
        # one-shot (unpipelined) latency includes the tunnel sync; report both
        t_sync = min(_run(lambda: gjkepa(c1, c2, cfg=cfg), lambda r: r.depth, 1)
                     for _ in range(5))
        results["c1_single_pair_latency_us"] = t * 1e6
        results["c1_single_pair_sync_latency_us"] = t_sync * 1e6
        log(f"config1 single-pair latency: {t*1e6:.1f} us pipelined, "
            f"{t_sync*1e6:.1f} us incl. host sync (depth={float(r.depth):.6f})")

    # ---- config 2: hull pairs, boolean + distance --------------------------
    # 4k batch (dispatch-sensitive, kept for round-over-round comparability)
    # and 64k batch (dispatch amortized — the auditable throughput numbers,
    # VERDICT round-2 item 2).
    if want("c2"):
        from gjkepa_tpu.ops.fused import fused_gjk_distance_hulls
        gjk_cfg = cfg.replace(epa_max_iters=0)  # boolean-only: one GJK kernel
        for tag, B2 in (("hull4k", 4096), ("hull64k", 65536)):
            N2 = 64
            p1 = jnp.asarray(random_hulls(rng, B2, N2))
            p2 = jnp.asarray(random_hulls(rng, B2, N2))
            t_bool = timeit(lambda: fused_gjkepa_hulls(p1, p2, cfg=gjk_cfg,
                                                       block=512),
                            lambda r: r.gjk_iters.astype(jnp.float32))
            # block 256: tuned for the two-phase dispatch (r5 sweep: 256
            # beats 512 by ~6% — phase-1 blocks exit at their slowest lane
            # and narrower blocks shorten that tail)
            t_dist = timeit(lambda: fused_gjk_distance_hulls(p1, p2, cfg=cfg,
                                                             block=256),
                            lambda r: r.distance)
            if tag == "hull64k":
                maybe_profile("c2_bool", lambda: fused_gjkepa_hulls(
                    p1, p2, cfg=gjk_cfg, block=512),
                    lambda r: r.gjk_iters.astype(jnp.float32))
                maybe_profile("c2_dist", lambda: fused_gjk_distance_hulls(
                    p1, p2, cfg=cfg, block=256),
                    lambda r: r.distance)
            results[f"c2_{tag}_bool_qps"] = B2 / t_bool
            results[f"c2_{tag}_dist_qps"] = B2 / t_dist
            log(f"config2 {tag} x 64-vert hulls: bool {B2/t_bool/1e6:.2f}M q/s, "
                f"distance {B2/t_dist/1e6:.2f}M q/s")

    # ---- config 3: 64k mixed analytic pairs (HEADLINE) ---------------------
    # Median over 3 seeds: the round-2 headline swung +-65% with the seed
    # (cylinder-rim EPA tail); the median is the comparable number
    # (VERDICT round-2 item 2).  Same shapes/sizes per seed => one program.
    B3 = 65536
    q = B3 // 4

    def mk3(seed_rng):
        pos = lambda: seed_rng.normal(size=(q, 3)).astype(np.float32) * 1.2  # noqa: E731
        return concat_shapes(
            spheres(0.4 + 0.4 * seed_rng.random(q).astype(np.float32), pos=pos()),
            boxes(0.3 + 0.4 * seed_rng.random((q, 3)).astype(np.float32), pos=pos()),
            capsules(0.2 + 0.2 * seed_rng.random(q).astype(np.float32),
                     0.3 + 0.3 * seed_rng.random(q).astype(np.float32), pos=pos()),
            cylinders(0.2 + 0.3 * seed_rng.random(q).astype(np.float32),
                      0.3 + 0.3 * seed_rng.random(q).astype(np.float32), pos=pos()),
        )

    if want("c3"):
        c3_qps = []
        for seed in (0, 1, 2):
            srng = np.random.default_rng(seed)
            a, b = mk3(srng), mk3(srng)
            t3 = timeit(lambda: fused_gjkepa_shapes(a, b, cfg=cfg, block=512),
                        lambda r: r.depth)
            r3 = fused_gjkepa_shapes(a, b, cfg=cfg, block=512)
            hits = int(jnp.sum(r3.hit))
            max_epa = int(jnp.max(r3.epa_iters))
            c3_qps.append(B3 / t3)
            results[f"c3_seed{seed}_qps"] = B3 / t3
            log(f"config3 64k mixed analytic seed {seed}: {B3/t3/1e6:.2f}M q/s "
                f"({hits} hits, max EPA iters {max_epa})")
            if seed == 0:
                maybe_profile("c3_analytic64k",
                              lambda: fused_gjkepa_shapes(a, b, cfg=cfg,
                                                          block=512),
                              lambda r: r.depth)
        results["c3_analytic64k_qps"] = float(np.median(c3_qps))
        results["c3_seed_spread"] = (max(c3_qps) - min(c3_qps)) / max(c3_qps)
        log(f"config3 64k mixed analytic: median {np.median(c3_qps)/1e6:.2f}M "
            f"q/s (spread {100*results['c3_seed_spread']:.0f}%)")

        # order-independence check: same pairs, caller-shuffled (the GJK-lane
        # grouping must make throughput independent of input pair order)
        srng = np.random.default_rng(0)
        a, b = mk3(srng), mk3(srng)
        perm = srng.permutation(B3)
        b = type(b)(kind=b.kind[perm], params=b.params[perm],
                    pos=b.pos[perm], rot=b.rot[perm])
        a = type(a)(kind=a.kind[perm], params=a.params[perm],
                    pos=a.pos[perm], rot=a.rot[perm])
        t3s = timeit(lambda: fused_gjkepa_shapes(a, b, cfg=cfg, block=512),
                     lambda r: r.depth)
        results["c3_shuffled_qps"] = B3 / t3s
        log(f"config3 64k shuffled order: {B3/t3s/1e6:.2f}M q/s")

    # mixed hull-vs-analytic-shape fused path (capability extension —
    # the reference is cloud-vs-cloud only; round 3 moved this from the
    # vmapped XLA path, 0.01M q/s, into the fused kernels)
    if want("c3b") or want("c3"):
        from gjkepa_tpu.ops.fused import fused_gjkepa_hull_shapes
        B3b, N3b = 16384, 24
        hulls_m = jnp.asarray(random_hulls(rng, B3b, N3b))
        qm = B3b // 4
        posm = lambda: rng.normal(size=(qm, 3)).astype(np.float32) * 0.8  # noqa
        shm = concat_shapes(
            spheres(0.3 + 0.4 * rng.random(qm).astype(np.float32), pos=posm()),
            boxes(0.25 + 0.3 * rng.random((qm, 3)).astype(np.float32), pos=posm()),
            capsules(0.2 + 0.2 * rng.random(qm).astype(np.float32),
                     0.25 + 0.25 * rng.random(qm).astype(np.float32), pos=posm()),
            cylinders(0.2 + 0.25 * rng.random(qm).astype(np.float32),
                      0.25 + 0.25 * rng.random(qm).astype(np.float32), pos=posm()),
        )
        t3b = timeit(lambda: fused_gjkepa_hull_shapes(hulls_m, shm, cfg=cfg,
                                                      block=512),
                     lambda r: r.depth, warmup=25, k0=2)
        maybe_profile("c3b_mixed", lambda: fused_gjkepa_hull_shapes(
            hulls_m, shm, cfg=cfg, block=512), lambda r: r.depth)
        results["c3_mixed_hull_shape_qps"] = B3b / t3b
        log(f"config3b 16k mixed hull-vs-shape (fused): {B3b/t3b/1e6:.2f}M q/s")

    # ---- config 4: 16k deep-penetration pairs, full EPA --------------------
    B4, N4 = 16384, 24
    big = random_hulls(rng, B4, N4, spread=0.0) * 2.0
    small = random_hulls(rng, B4, N4, spread=0.0) * 0.5
    small += rng.normal(size=(B4, 1, 3)).astype(np.float32) * 0.2
    p41, p42 = jnp.asarray(big), jnp.asarray(small)

    if want("c4"):
        t4 = timeit(lambda: fused_gjkepa_hulls(p41, p42, cfg=cfg, block=512),
                    lambda r: r.depth, warmup=25, k0=2)
        maybe_profile("c4_deep16k", lambda: fused_gjkepa_hulls(p41, p42,
                                                               cfg=cfg,
                                                               block=512),
                      lambda r: r.depth)
        r4 = fused_gjkepa_hulls(p41, p42, cfg=cfg, block=512)
        hit_frac = float(jnp.mean(r4.hit.astype(jnp.float32)))
        results["c4_deep16k_qps"] = B4 / t4
        results["c4_hit_fraction"] = hit_frac
        log(f"config4 16k deep-penetration: {B4/t4/1e6:.3f}M q/s "
            f"(hit fraction {hit_frac:.2f}, mean EPA iters "
            f"{float(jnp.mean(r4.epa_iters.astype(jnp.float32))):.1f})")

        # config 4 also names contact manifolds (BASELINE.json): full-surface
        # query + up-to-4-point manifolds on every deep pair, end to end.
        from gjkepa_tpu import manifold_batch
        from gjkepa_tpu.api import gjkepa_batch_fused

        @jax.jit
        def deep_manifolds(a4, b4):
            r = gjkepa_batch_fused(a4, b4, cfg=cfg, block=512)
            return manifold_batch(a4, b4, r.normal, r.depth, r.hit,
                                  r.contact_point, cfg=cfg)

        t4m = timeit(lambda: deep_manifolds(p41, p42),
                     lambda m: m.depths, warmup=20, k0=2)
        maybe_profile("c4_manifold", lambda: deep_manifolds(p41, p42),
                      lambda m: m.depths)
        m4 = deep_manifolds(p41, p42)
        pts_per_hit = float(jnp.sum(m4.mask)) / max(
            float(jnp.sum(r4.hit.astype(jnp.float32))), 1.0)
        results["c4_manifold_qps"] = B4 / t4m
        log(f"config4 16k manifolds (full surface + clip): {B4/t4m/1e6:.3f}M "
            f"q/s ({pts_per_hit:.2f} contact points/hit)")

    # ---- config 6: fused path sharded over the device mesh ------------------
    # (per-chip throughput; on a multi-chip host the pair axis shards over
    # ICI with zero collectives — SURVEY §2.4.  This box has 1 chip.)
    if want("c6"):
        from gjkepa_tpu.parallel import (gjkepa_batch_fused_sharded, pair_mesh,
                                         shard_pairs)
        mesh = pair_mesh()
        nd = int(mesh.devices.size)
        p41s, p42s = shard_pairs(mesh, p41, p42)
        t6 = timeit(lambda: gjkepa_batch_fused_sharded(mesh, p41s, p42s,
                                                       cfg=cfg, block=512),
                    lambda r: r.depth, warmup=15, k0=2)
        results["c6_sharded_fused_qps"] = B4 / t6
        results["c6_n_devices"] = nd
        log(f"config6 sharded fused (full surface) on {nd} device(s): "
            f"{B4/t6/1e6:.3f}M q/s")

    # ---- config 5: mini-sim 1024 falling boxes -----------------------------
    if want("c5"):
        from gjkepa_tpu.sim.rigid import SimConfig, init_boxes, sim_step
        state = init_boxes(1024, height=6.0, spread=14.0)
        scfg = SimConfig(max_pairs=8192)

        def steps10(s):
            for _ in range(10):
                s, _ = sim_step(s, scfg)
            return s

        t5 = timeit(lambda: steps10(state), lambda s: s.pos,
                    warmup=6, k0=1) / 10
        maybe_profile("c5_sim1024", lambda: steps10(state), lambda s: s.pos,
                      calls=2)
        results["c5_sim1024_steps_per_sec"] = 1.0 / t5
        log(f"config5 1024-box sim: {1.0/t5:.1f} steps/s")

        # 16k-body scaling check (VERDICT round-2 item 5: the sweep-and-prune
        # broadphase must keep the sim sub-quadratic at 16k bodies)
        state16 = init_boxes(16384, height=8.0, spread=55.0)
        scfg16 = SimConfig(max_pairs=65536)

        def steps3(s):
            for _ in range(3):
                s, _ = sim_step(s, scfg16)
            return s

        t5b = timeit(lambda: steps3(state16), lambda s: s.pos,
                     warmup=4, k0=1, kmax=512) / 3
        maybe_profile("c5_sim16k", lambda: steps3(state16), lambda s: s.pos,
                      calls=2)
        results["c5_sim16k_steps_per_sec"] = 1.0 / t5b
        log(f"config5b 16384-box sim: {1.0/t5b:.1f} steps/s")

    headline = results.get("c3_analytic64k_qps", 0.0)
    out = {
        "metric": "gjkepa_pair_queries_per_sec_64k_batch",
        "value": headline,
        "unit": "queries/s",
        "vs_baseline": headline / 50e6,
        "configs": {k: (round(v, 4) if isinstance(v, float) else v)
                    for k, v in results.items()},
    }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
