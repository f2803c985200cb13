"""A/B: Adam-moment preservation across densify events (VERDICT r2 next #10).

Trains the same small courtyard capture twice — preserve_adam_on_densify=True
(official-3DGS cat_tensors_to_optimizer semantics) vs False (the reference's
full Adam rebuild at every event, gs_model.py:263) — and writes both held-out
PSNR curves. Everything else (scene, seeds, schedule, the round-3 densify
control) is identical.

  python benchmarks/ab_adam.py --out docs/artifacts/ab_adam
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def run_arm(preserve, cap, images, train_idx, hold, args):
    import jax.numpy as jnp

    from simplegaussiansplat_tk71_tpu.data.colmap import ColmapScene
    from simplegaussiansplat_tk71_tpu.data.dataset import SceneDataset
    from simplegaussiansplat_tk71_tpu.models.gaussians import init_from_points
    from simplegaussiansplat_tk71_tpu.render import render
    from simplegaussiansplat_tk71_tpu.train.config import TrainConfig
    from simplegaussiansplat_tk71_tpu.train.trainer import Trainer
    from simplegaussiansplat_tk71_tpu.utils.knn import knn_mean_dist

    scene = ColmapScene(
        xyz=cap.sfm_xyz, rgb=cap.sfm_rgb,
        P=cap.P[train_idx], K=cap.K[train_idx], wh=cap.wh[train_idx],
        image_names=[f"cam{i}" for i in train_idx],
    )
    ds = SceneDataset(scene, images=images[train_idx])
    cfg = TrainConfig(
        iterations=args.steps,
        densify_from_iter=300, densify_until_iter=args.steps // 2,
        densification_interval=100, opacity_reset_interval=1000,
        max_per_tile=512, cull_alpha_min=1 / 255,
        max_alive=60_000, growth_limit=2.0, max_screen_size=20.0,
        preserve_adam_on_densify=preserve,
    )
    model = init_from_points(
        cap.sfm_xyz, knn_mean_dist(cap.sfm_xyz, cfg.knn_points),
        opacity_init=cfg.opacity_init, sh_degree=cfg.sh_degree,
    )
    tr = Trainer(model, ds, cfg, log_fn=lambda *a: None)
    hold_P, hold_K = jnp.asarray(cap.P[hold]), jnp.asarray(cap.K[hold])
    hold_gt = jnp.asarray(images[hold])

    curve = []
    for P, K, imgs, _ in ds.batches(cfg.batch_size, seed=0):
        tr.run_step(P, K, imgs)
        if tr.step % args.eval_every == 0 or tr.step == args.steps:
            img, _ = render(
                tr.model, hold_P, hold_K,
                (args.width, args.height), tr.render_cfg,
            )
            mse = float(jnp.mean(jnp.square(jnp.clip(img, 0, 1) - hold_gt)))
            psnr = 10 * np.log10(1.0 / max(mse, 1e-12))
            curve.append({
                "step": tr.step, "psnr": round(psnr, 3), "alive": tr.n_alive,
            })
            log(f"  [{'preserve' if preserve else 'rebuild '}] step {tr.step} "
                f"psnr {psnr:.2f} alive {tr.n_alive}")
        if tr.step >= args.steps:
            break
    return curve, tr.densify_events


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="docs/artifacts/ab_adam")
    ap.add_argument("--cams", type=int, default=24)
    ap.add_argument("--width", type=int, default=128)
    ap.add_argument("--height", type=int, default=85)
    ap.add_argument("--steps", type=int, default=1600)
    ap.add_argument("--eval-every", type=int, default=200)
    args = ap.parse_args()

    from simplegaussiansplat_tk71_tpu.data.synthetic import (
        make_courtyard_capture,
        render_capture_images,
    )
    from simplegaussiansplat_tk71_tpu.render import RenderConfig

    os.makedirs(args.out, exist_ok=True)
    cap = make_courtyard_capture(
        n_cams=args.cams, width=args.width, height=args.height,
        gt_points_scale=0.05, sfm_points=1200,
    )
    gt_cfg = RenderConfig(max_per_tile=1024, tile_chunk=16)
    images = np.clip(render_capture_images(cap, gt_cfg, batch=4), 0, 1)
    idx = np.arange(args.cams)
    hold = idx[::6]
    train_idx = np.setdiff1d(idx, hold)

    t0 = time.time()
    out = {}
    for name, preserve in (("preserve", True), ("rebuild", False)):
        log(f"arm: {name}")
        curve, events = run_arm(preserve, cap, images, train_idx, hold, args)
        out[name] = {
            "curve": curve,
            "final_psnr": curve[-1]["psnr"],
            "final_alive": curve[-1]["alive"],
            "densify_events": len(events),
        }
    out["delta_final_psnr_preserve_minus_rebuild"] = round(
        out["preserve"]["final_psnr"] - out["rebuild"]["final_psnr"], 3
    )
    out["wall_min"] = round((time.time() - t0) / 60, 1)
    with open(f"{args.out}/summary.json", "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps({
        k: (v if not isinstance(v, dict) else
            {kk: vv for kk, vv in v.items() if kk != "curve"})
        for k, v in out.items()
    }))


if __name__ == "__main__":
    main()
