"""Non-self-referential quality evidence (VERDICT round-2 next #4).

The main quality run fits images rendered by the SAME renderer under test,
which is blind to systematic renderer bias. Here the ground-truth images are
produced by the independent float64 oracle (tests/oracle.py: no tiling, no
per-tile K, no culling, f64 end-to-end — a direct port of the reference's
math, gs_model.py:277-624), and the production pipeline trains against them.
The held-out PSNR is therefore measured against ground truth that the code
under test never produced.

  python benchmarks/oracle_gt_eval.py --out docs/artifacts/oracle_gt

Writes summary.json (held-out PSNR/SSIM vs oracle GT + the renderer-bias
PSNR between production and oracle renders of the same model), eval.jsonl,
and PNGs.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests")
)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="docs/artifacts/oracle_gt")
    ap.add_argument("--cams", type=int, default=30)
    ap.add_argument("--width", type=int, default=160)
    ap.add_argument("--height", type=int, default=107)
    ap.add_argument("--gt-scale", type=float, default=0.06,
                    help="courtyard gt_points_scale (~3.5k gaussians at 0.06)")
    ap.add_argument("--sfm-points", type=int, default=1500)
    ap.add_argument("--steps", type=int, default=2500)
    ap.add_argument("--eval-holdout", type=int, default=6)
    args = ap.parse_args()

    from oracle import render_oracle

    from simplegaussiansplat_tk71_tpu.data.colmap import ColmapScene
    from simplegaussiansplat_tk71_tpu.data.dataset import SceneDataset
    from simplegaussiansplat_tk71_tpu.data.synthetic import make_courtyard_capture
    from simplegaussiansplat_tk71_tpu.models.gaussians import init_from_points
    from simplegaussiansplat_tk71_tpu.render import RenderConfig, render
    from simplegaussiansplat_tk71_tpu.train.config import TrainConfig
    from simplegaussiansplat_tk71_tpu.train.trainer import Trainer
    from simplegaussiansplat_tk71_tpu.utils.knn import knn_mean_dist
    from simplegaussiansplat_tk71_tpu.utils.logging import save_png
    from simplegaussiansplat_tk71_tpu.utils.metrics import ssim

    import jax
    import jax.numpy as jnp

    os.makedirs(args.out, exist_ok=True)
    W, H = args.width, args.height
    cap = make_courtyard_capture(
        n_cams=args.cams, width=W, height=H,
        gt_points_scale=args.gt_scale, sfm_points=args.sfm_points,
    )
    model = cap.gt_model
    alive = np.asarray(model.alive)
    n_gt = int(alive.sum())
    nb = (model.sh_degree + 1) ** 2
    model_np = {
        "mean": np.asarray(model.mean).T[alive].astype(np.float64),
        "quat": np.asarray(model.quat).T[alive].astype(np.float64),
        "log_scale": np.asarray(model.log_scale).T[alive].astype(np.float64),
        "opacity": 1.0
        / (1.0 + np.exp(-np.asarray(model.logit_opacity)[alive].astype(np.float64))),
        "sh": np.asarray(model.sh).T[alive].reshape(n_gt, nb, 3).astype(np.float64),
    }

    log(f"oracle-rendering {args.cams} views of {n_gt} gaussians at {W}x{H} "
        "(float64, no tiles, no culling)...")
    t0 = time.time()
    images = np.stack([
        np.clip(render_oracle(model_np, cap.P[i], cap.K[i], W, H), 0.0, 1.0)
        for i in range(args.cams)
    ]).astype(np.float32)
    log(f"oracle GT rendered in {time.time() - t0:.1f}s, mean={images.mean():.3f}")
    save_png(f"{args.out}/oracle_gt_cam0.png", images[0])

    # renderer-bias measurement: production render of the SAME gt model
    cfg_exact = RenderConfig(max_per_tile=2048, tile_chunk=16)
    prod_imgs, aux = render(
        model, jnp.asarray(cap.P[:4]), jnp.asarray(cap.K[:4]), (W, H), cfg_exact
    )
    prod_imgs = np.clip(np.asarray(prod_imgs), 0, 1)
    bias_mse = float(np.mean((prod_imgs - images[:4]) ** 2))
    bias_psnr = 10 * np.log10(1.0 / max(bias_mse, 1e-12))
    log(f"renderer bias (production vs oracle, 4 views): {bias_psnr:.2f} dB "
        f"(truncated={int(np.asarray(aux.truncated).sum())})")

    idx = np.arange(args.cams)
    hold = idx[:: args.eval_holdout]
    train_idx = np.setdiff1d(idx, hold)
    scene = ColmapScene(
        xyz=cap.sfm_xyz, rgb=cap.sfm_rgb,
        P=cap.P[train_idx], K=cap.K[train_idx], wh=cap.wh[train_idx],
        image_names=[f"cam{i}" for i in train_idx],
    )
    ds = SceneDataset(scene, images=images[train_idx])

    tcfg = TrainConfig(
        iterations=args.steps,
        densify_from_iter=300, densify_until_iter=args.steps // 2,
        densification_interval=100, opacity_reset_interval=1000,
        max_per_tile=512, cull_alpha_min=1 / 255,
        # screen-prune radius scaled to this resolution: the r3 ablation
        # measured the courtyard GT radius distribution p99 ~= 43 px at
        # 400x266 (docs/artifacts/quality_run_r3/ABLATION.md), i.e. ~17 px
        # at 160 wide; 24 px covers it with margin while still pruning
        # degenerate monsters
        max_alive=60_000, growth_limit=2.0,
        max_screen_size=24.0 * args.width / 160.0,
    )
    train_model = init_from_points(
        cap.sfm_xyz, knn_mean_dist(cap.sfm_xyz, tcfg.knn_points),
        opacity_init=tcfg.opacity_init, sh_degree=tcfg.sh_degree,
    )
    trainer = Trainer(train_model, ds, tcfg, log_fn=log)
    log(f"training: init {trainer.n_alive} alive, extent {trainer.extent:.2f}")

    hold_gt = jnp.asarray(images[hold])
    hold_P, hold_K = jnp.asarray(cap.P[hold]), jnp.asarray(cap.K[hold])

    def evaluate():
        img, _ = render(trainer.model, hold_P, hold_K, (W, H), trainer.render_cfg)
        img = jnp.clip(img, 0, 1)
        mse = jnp.mean(jnp.square(img - hold_gt), axis=(1, 2, 3))
        p = 10.0 * jnp.log10(1.0 / jnp.maximum(mse, 1e-12))
        s = np.mean([
            float(ssim(jnp.moveaxis(img[i], -1, 0), jnp.moveaxis(hold_gt[i], -1, 0)))
            for i in range(img.shape[0])
        ])
        return float(jnp.mean(p)), float(s), np.asarray(img[0])

    efile = open(f"{args.out}/eval.jsonl", "a")
    t_train = time.time()
    for P, K, imgs, b_idx in ds.batches(tcfg.batch_size, seed=0):
        trainer.run_step(P, K, imgs)
        # x460: off both the densify cadence (multiples of 100) and the
        # opacity resets (multiples of 1000) — an eval right on an event
        # step measures the intentional transient (see quality_run.py)
        if trainer.step % 500 == 460:
            p, s, im0 = evaluate()
            rec = {"step": trainer.step, "psnr": round(p, 3),
                   "ssim": round(s, 4), "alive": trainer.n_alive}
            efile.write(json.dumps(rec) + "\n")
            efile.flush()
            log(f"[eval @ {trainer.step}] PSNR {p:.2f} SSIM {s:.4f} "
                f"alive={trainer.n_alive}")
        if trainer.step >= args.steps:
            break
    p, s, im0 = evaluate()
    save_png(f"{args.out}/final_hold0.png", im0)
    save_png(f"{args.out}/final_hold0_gt.png", images[hold][0])
    summary = {
        "gt_source": "float64 oracle (tests/oracle.py render_oracle) — "
                     "independent of the production renderer",
        "gt_gaussians": n_gt,
        "cams": args.cams,
        "image": [W, H],
        "steps": trainer.step,
        "final_alive": trainer.n_alive,
        "holdout_psnr_vs_oracle_gt": round(p, 3),
        "holdout_ssim_vs_oracle_gt": round(s, 4),
        "renderer_bias_psnr_prod_vs_oracle": round(bias_psnr, 2),
        "wall_clock_min": round((time.time() - t_train) / 60, 1),
        "backend": jax.default_backend(),
    }
    with open(f"{args.out}/summary.json", "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
