"""Stage decomposition of the production 300^3 masked train step.

The 300^3 alpha-masked phase is the wall-clock king of the reference
schedule (23k of 30k iterations at 0.73-0.85 s/it, reference
train.py:262-349; BASELINE.md run history) but round 3's roofline table
only covered the 128^3 unmasked step. This script times the full masked
step and its stages as separate jitted programs on the same synthetic
lego-scale scene (extra/bench_eval_render.build_scene: 313^2-class grid,
spherical-shell mask), so the optimization target is measurable:

    python extra/decompose_train_step.py [--grid 300] [--batch 4096]
        [--compact_ratio 0.5] [--occupancy shell|sphere]

Stage programs (each timed with the decompose_pose reps-in-graph method —
an on-device fori_loop amortizes the ~60 ms relay rtt):

  A. full train step (fwd+bwd+adam), the production program
  B. forward only (render_rays, is_train=True)
  C. feature evaluation fwd on the k-sample compact buffer
  D. feature evaluation fwd+bwd (adds the gather-transpose scatter-adds
     into the plane/line grids -- the suspected backward hot spot)
  E. alpha gate + block nonzero + coord gather (index machinery)
  F. raw2alpha transmittance fwd+bwd on the dense [N, S]
  G. shading head fwd+bwd on [N, app_dim]
  H. adam update alone (optax transform + apply_updates)
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from iffnerf_tpu.runtime import setup as _runtime_setup

_runtime_setup()

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench_eval_render import build_scene, camera_rays  # noqa: E402


def _pull(x):
    return float(np.asarray(x))


def bench(label, make_body, reps=8, base=0.0, consts=(), timed=3):
    # large closures must flow as ARGUMENTS: closed-over arrays become
    # jaxpr constants and the remote-compile request exceeds the relay's
    # body-size limit (HTTP 413)
    @jax.jit
    def looped(*consts):
        def body(i, carry):
            return carry + make_body(i, *consts)

        return jax.lax.fori_loop(0, reps, body, jnp.float32(0.0))

    _pull(looped(*consts))
    ts = []
    for _ in range(timed):
        t0 = time.perf_counter()
        _pull(looped(*consts))
        ts.append(time.perf_counter() - t0)
    dt = (float(np.median(ts)) - base) / reps * 1e3
    print(f"{label:58s} {dt:9.2f} ms  (reps={reps})", flush=True)
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--grid", type=int, default=300)
    ap.add_argument("--extent", type=float, default=1.5)
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--compact_ratio", type=float, default=0.5)
    ap.add_argument("--occupancy", choices=["shell", "sphere"],
                    default="sphere",
                    help="shell: trained-lego-like ~9%% valid; sphere: the "
                         "round-2 fixture's solid ball (~33%% valid, the "
                         "0.73-0.77 s/it baseline regime)")
    ap.add_argument("--reps", type=int, default=8)
    ap.add_argument("--stages", type=str, default="ABCDEFGH",
                    help="subset of stage letters to run (e.g. AD)")
    args = ap.parse_args()
    stages = set(args.stages.upper())

    import dataclasses

    from iffnerf_tpu.models.field import (
        compute_features_fused,
        gate_group_for,
        make_alpha_mask,
        normalize_coord,
        sample_alpha_gate,
    )
    from iffnerf_tpu.models.render import _BLOCK, render_rays, sample_ray
    from iffnerf_tpu.models.shading import apply_shading
    from iffnerf_tpu.ops.ray_march import raw2alpha
    from iffnerf_tpu.train.trainer import make_optimizer, make_train_step

    cfg, params, mask = build_scene(args.grid, args.extent)
    if args.occupancy == "sphere":
        g = 200
        lin = np.linspace(-args.extent, args.extent, g, dtype=np.float32)
        zz, yy, xx = np.meshgrid(lin, lin, lin, indexing="ij")
        r = np.sqrt(xx**2 + yy**2 + zz**2)
        vol = (r < 0.62 * args.extent).astype(np.float32)
        mask = make_alpha_mask(
            jnp.asarray(vol),
            np.array([[-args.extent] * 3, [args.extent] * 3], np.float32),
        )
    cfg = dataclasses.replace(cfg, compact_ratio=args.compact_ratio)
    group = gate_group_for(mask.volume.shape, np.asarray(mask.aabb),
                           cfg.step_size, mask.bits_window, dir_bound=1.0)
    cfg = dataclasses.replace(cfg, mask_gate_group=group)
    n_samples = cfg.n_samples
    print(f"grid {cfg.grid_size} n_samples {n_samples} batch {args.batch} "
          f"compact_ratio {cfg.compact_ratio} gate_group {group}")

    # real training rays: random pixels of the blender orbit camera
    all_rays = camera_rays()
    rng = np.random.default_rng(0)
    sel = rng.choice(all_rays.shape[0], args.batch, replace=False)
    rays = jnp.asarray(all_rays[sel])
    rgbs = jax.random.uniform(jax.random.PRNGKey(3), (args.batch, 4))
    key = jax.random.PRNGKey(1)

    # measured occupancy of the sample window (drives which compact branch
    # the switch takes -- the production number is only comparable at a
    # matching valid fraction)
    xyz, z_vals, ray_valid = sample_ray(cfg, rays[:, :3], rays[:, 3:6],
                                        key=key, is_train=True,
                                        n_samples=n_samples)
    gated = ray_valid & sample_alpha_gate(mask, xyz, cfg.mask_gate_group)
    frac = float(jnp.mean(gated))
    n_tot = args.batch * n_samples
    k = max(((int(n_tot * cfg.compact_ratio) + 127) // 128) * 128, 128)
    blk = float(jnp.mean(jnp.any(
        gated.reshape(-1, _BLOCK), axis=-1).astype(jnp.float32)))
    print(f"valid fraction {frac:.3f} (block-any {blk:.3f}) "
          f"-> compact buffer k={k} of {n_tot} "
          f"[{'compact' if blk * n_tot < k else 'DENSE FALLBACK'}]")

    base = 0.0
    _pull(jnp.float32(0))
    t0 = time.perf_counter()
    for _ in range(10):
        _pull(jnp.float32(0))
    base = (time.perf_counter() - t0) / 10
    print(f"scalar pull rtt {base * 1e3:.1f} ms")

    reps = args.reps
    weights = {"l1": jnp.float32(8e-5), "tv_d": jnp.float32(0),
               "tv_a": jnp.float32(0)}

    # ---- A. the full production step ----
    state = make_optimizer(params, 0.02, 1e-3, 0.9999)
    if "A" in stages:
        step_fn = make_train_step(
            cfg, state.tx, has_mask=True, n_samples=n_samples, ndc_ray=False,
            ortho_weight=0.0, use_l1=True, use_tv_density=False,
            use_tv_app=False, rgb_channels=4,
        )
        idx = jnp.arange(args.batch, dtype=jnp.int32)

        # the step donates params/opt_state; time it as a host loop of real
        # dispatches instead (the production trainer's own dispatch pattern)
        p = jax.tree.map(jnp.array, params)
        o = jax.tree.map(jnp.array, state.opt_state)  # the step donates both
        p, o, mse = step_fn(p, o, mask, rays, rgbs, idx, key, jnp.ones(3),
                            weights)
        _pull(mse)
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(reps):
                p, o, mse = step_fn(p, o, mask, rays, rgbs, idx, key,
                                    jnp.ones(3), weights)
            _pull(mse)
            ts.append(time.perf_counter() - t0)
        a_ms = (float(np.median(ts)) - base) / reps * 1e3
        print(f"{'A. full masked train step (fwd+bwd+adam)':58s} "
              f"{a_ms:9.2f} ms  (reps={reps})", flush=True)

    # ---- B. forward only ----
    def fwd(i, params, mask, rays):
        rgb, *_ = render_rays(cfg, params, mask,
                              rays.at[0, 0].add(jnp.float32(i) * 1e-12),
                              key=key, is_train=True, bg_color=1.0,
                              n_samples=n_samples)
        return jnp.sum(rgb)

    if "B" in stages:
        bench("B. forward only (masked render_rays)", fwd, reps=reps,
              base=base, consts=(params, mask, rays))

    # ---- C/D. feature evaluation on the k-sample buffer ----
    coords_f = normalize_coord(cfg, xyz).reshape(-1, 3)
    valid_f = gated.reshape(-1)
    (bidx,) = jnp.nonzero(
        jnp.any(valid_f.reshape(-1, _BLOCK), axis=-1), size=k // _BLOCK,
        fill_value=n_tot // _BLOCK - 1,
    )
    sidx = (bidx[:, None] * _BLOCK
            + jnp.arange(_BLOCK, dtype=bidx.dtype)[None, :]).reshape(-1)
    cc = jnp.take(coords_f, sidx, axis=0)
    jax.block_until_ready(cc)

    def feat_fwd(i, params, cc):
        s, a = compute_features_fused(
            cfg, params, cc.at[0, 0].add(jnp.float32(i) * 1e-12))
        return jnp.sum(s) + jnp.sum(a)

    if "C" in stages:
        bench(f"C. feature eval fwd (k={k})", feat_fwd, reps=reps,
              base=base, consts=(params, cc))

    def feat_bwd(i, params, cc):
        def f(p):
            s, a = compute_features_fused(
                cfg, p, cc.at[0, 0].add(jnp.float32(i) * 1e-12))
            return jnp.sum(s) + jnp.sum(a)

        v, g = jax.value_and_grad(f)(params)
        return v + sum(jnp.sum(l) for l in jax.tree.leaves(g))

    if "D" in stages:
        bench(f"D. feature eval fwd+bwd (k={k})", feat_bwd, reps=reps,
              base=base, consts=(params, cc))

    # ---- E. gate + nonzero + gather ----
    def gate_idx(i, params, mask, rays):
        xyz, z, rv = sample_ray(
            cfg, rays[:, :3].at[0, 0].add(jnp.float32(i) * 1e-12),
            rays[:, 3:6], key=key, is_train=True, n_samples=n_samples)
        g = rv & sample_alpha_gate(mask, xyz, cfg.mask_gate_group)
        vf = g.reshape(-1)
        (bi,) = jnp.nonzero(jnp.any(vf.reshape(-1, _BLOCK), -1),
                            size=k // _BLOCK,
                            fill_value=n_tot // _BLOCK - 1)
        si = (bi[:, None] * _BLOCK
              + jnp.arange(_BLOCK, dtype=bi.dtype)[None, :]).reshape(-1)
        c = jnp.take(normalize_coord(cfg, xyz).reshape(-1, 3), si, axis=0)
        return jnp.sum(c)

    # E sub-stages: attribute the k-independent index-extraction cost
    # (largest stage once buffers are matched, BASELINE round-4 reading #3)
    def e1_sample(i, rays):
        xyz, z, rv = sample_ray(
            cfg, rays[:, :3].at[0, 0].add(jnp.float32(i) * 1e-12),
            rays[:, 3:6], key=key, is_train=True, n_samples=n_samples)
        return jnp.sum(xyz) + jnp.sum(rv)

    def e2_gate(i, params, mask, rays):
        xyz, z, rv = sample_ray(
            cfg, rays[:, :3].at[0, 0].add(jnp.float32(i) * 1e-12),
            rays[:, 3:6], key=key, is_train=True, n_samples=n_samples)
        g = rv & sample_alpha_gate(mask, xyz, cfg.mask_gate_group)
        return jnp.sum(g)

    def e3_nonzero(i, params, mask, rays):
        xyz, z, rv = sample_ray(
            cfg, rays[:, :3].at[0, 0].add(jnp.float32(i) * 1e-12),
            rays[:, 3:6], key=key, is_train=True, n_samples=n_samples)
        g = rv & sample_alpha_gate(mask, xyz, cfg.mask_gate_group)
        vf = g.reshape(-1)
        (bi,) = jnp.nonzero(jnp.any(vf.reshape(-1, _BLOCK), -1),
                            size=k // _BLOCK,
                            fill_value=n_tot // _BLOCK - 1)
        return jnp.sum(bi)

    def _flags(i, params, mask, rays):
        xyz, z, rv = sample_ray(
            cfg, rays[:, :3].at[0, 0].add(jnp.float32(i) * 1e-12),
            rays[:, 3:6], key=key, is_train=True, n_samples=n_samples)
        g = rv & sample_alpha_gate(mask, xyz, cfg.mask_gate_group)
        return jnp.any(g.reshape(-1, _BLOCK), -1)

    nb = n_tot // _BLOCK
    fill = nb - 1

    def e3_scatter(i, params, mask, rays):
        f = _flags(i, params, mask, rays)
        pos = jnp.cumsum(f.astype(jnp.int32)) - 1
        dest = jnp.where(f, pos, k // _BLOCK)
        bi = jnp.full((k // _BLOCK,), fill, jnp.int32).at[dest].set(
            jnp.arange(nb, dtype=jnp.int32), mode="drop",
            unique_indices=True)
        return jnp.sum(bi)

    def e3_search(i, params, mask, rays):
        f = _flags(i, params, mask, rays)
        c = jnp.cumsum(f.astype(jnp.int32))
        q = jnp.arange(1, k // _BLOCK + 1, dtype=jnp.int32)
        bi = jnp.searchsorted(c, q)
        bi = jnp.where(q <= c[-1], bi, fill).astype(jnp.int32)
        return jnp.sum(bi)

    if "E" in stages:
        bench("E. sample+gate+block-nonzero+coord gather", gate_idx,
              reps=reps, base=base, consts=(params, mask, rays))
        bench("E1. sample_ray alone", e1_sample,
              reps=reps, base=base, consts=(rays,))
        bench("E2. sample_ray + gate", e2_gate,
              reps=reps, base=base, consts=(params, mask, rays))
        bench("E3. sample_ray + gate + block-nonzero", e3_nonzero,
              reps=reps, base=base, consts=(params, mask, rays))
        bench("E3b. nonzero as cumsum + drop-scatter", e3_scatter,
              reps=reps, base=base, consts=(params, mask, rays))
        bench("E3c. nonzero as cumsum + searchsorted", e3_search,
              reps=reps, base=base, consts=(params, mask, rays))

    # ---- F. raw2alpha fwd+bwd on dense [N, S] ----
    sig0 = jnp.abs(jax.random.normal(key, (args.batch, n_samples))) * 0.1
    dists = jnp.full((args.batch, n_samples), 2.0 / n_samples)

    def march(i, sig0):
        def f(s):
            alpha, w, _ = raw2alpha(s, dists * cfg.distance_scale)
            return jnp.sum(w) + 0.1 * jnp.mean(jnp.exp(jnp.abs(alpha)))

        v, g = jax.value_and_grad(f)(
            sig0.at[0, 0].add(jnp.float32(i) * 1e-12))
        return v + jnp.sum(g)

    if "F" in stages:
        bench(f"F. raw2alpha fwd+bwd (dense {args.batch}x{n_samples})",
              march, reps=reps, base=base, consts=(sig0,))

    # ---- G. shading fwd+bwd ----
    feats = jax.random.normal(key, (args.batch, cfg.app_dim))
    vdirs = rays[:, 3:6]

    def shade(i, params, feats):
        def f(p):
            rgb, _ = apply_shading(
                p["shading"], cfg.shading_mode, None, vdirs,
                feats.at[0, 0].add(jnp.float32(i) * 1e-12),
                view_pe=cfg.view_pe, pos_pe=cfg.pos_pe, fea_pe=cfg.fea_pe)
            return jnp.sum(rgb)

        v, g = jax.value_and_grad(f)(params)
        return v + sum(jnp.sum(l) for l in jax.tree.leaves(g["shading"]))

    if "G" in stages:
        bench(f"G. shading fwd+bwd ({args.batch}x{cfg.app_dim})", shade,
              reps=reps, base=base, consts=(params, feats))

    # ---- H. adam alone ----
    g0 = jax.tree.map(jnp.ones_like, params)

    def adam(i, params, g0, o):
        g = jax.tree.map(lambda x: x + jnp.float32(i) * 1e-12, g0)
        import optax

        upd, _ = state.tx.update(g, o, params)
        newp = optax.apply_updates(params, upd)
        return sum(jnp.sum(l) for l in jax.tree.leaves(newp))

    if "H" in stages:
        bench("H. adam update alone", adam, reps=reps, base=base,
              consts=(params, g0, state.opt_state))


if __name__ == "__main__":
    main()
