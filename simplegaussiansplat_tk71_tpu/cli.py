"""Command-line interface.

Replaces the reference's interactive stdin prompts (gs_control.py:22-131) with
argparse subcommands; all hyperparameters default to the reference's
simple-mode values via TrainConfig.

  sgs-tpu train --scene <colmap_root> [--iterations N] [--out DIR] ...
  sgs-tpu synthetic-train [--gaussians N] [--cams M] ...   (no dataset needed)
  sgs-tpu render --checkpoint ckpt.npz --scene <colmap_root> --out DIR
  sgs-tpu info --scene <colmap_root>
"""

import argparse
import dataclasses
import os
import sys
import types
import typing

import numpy as np


def _add_config_flags(p: argparse.ArgumentParser):
    from simplegaussiansplat_tk71_tpu.train.config import TrainConfig

    scalars = {"int": int, "float": float, "str": str}
    for f in dataclasses.fields(TrainConfig):
        # Optional[X] fields take X on the command line (None = "unset");
        # resolve through either the string annotation or the typing object
        if isinstance(f.type, str):
            t = f.type
        elif typing.get_origin(f.type) in (typing.Union, types.UnionType):
            # both typing.Optional[X] and the X | None syntax
            inner = [a for a in typing.get_args(f.type) if a is not type(None)]
            t = inner[0].__name__ if len(inner) == 1 else str(f.type)
        else:
            t = getattr(f.type, "__name__", str(f.type))
        t = t.removeprefix("typing.").removeprefix("Optional[").removesuffix("]")
        flag = f"--{f.name.replace('_', '-')}"
        if t in scalars:
            p.add_argument(
                flag, type=scalars[t], default=None,
                help=f"TrainConfig.{f.name} (default {f.default})",
            )
        elif t == "bool":
            # two-way: --flag / --no-flag (store_true could never disable a
            # default-True bool like pair_grad_route)
            p.add_argument(
                flag, action=argparse.BooleanOptionalAction, default=None,
                help=f"TrainConfig.{f.name} (default {f.default})",
            )


def _config_from_args(args):
    from simplegaussiansplat_tk71_tpu.train.config import TrainConfig

    kwargs = {}
    for f in dataclasses.fields(TrainConfig):
        v = getattr(args, f.name, None)
        if v is not None:
            kwargs[f.name] = v
    return TrainConfig(**kwargs)


def cmd_info(args):
    from simplegaussiansplat_tk71_tpu.data.colmap import load_colmap_scene

    scene = load_colmap_scene(args.scene)
    print(f"cameras: {len(scene.P)}")
    print(f"points3D: {len(scene.xyz)}")
    print(f"image sizes: {np.unique(scene.wh, axis=0).tolist()}")
    print(f"first image: {scene.image_names[0] if scene.image_names else None}")


def cmd_train(args):
    from simplegaussiansplat_tk71_tpu.data.colmap import load_colmap_scene
    from simplegaussiansplat_tk71_tpu.data.dataset import SceneDataset
    from simplegaussiansplat_tk71_tpu.models.gaussians import init_from_points
    from simplegaussiansplat_tk71_tpu.train.trainer import Trainer
    from simplegaussiansplat_tk71_tpu.utils.knn import knn_mean_dist

    config = _config_from_args(args)
    scene = load_colmap_scene(args.scene)
    ds = SceneDataset(scene, root_dir=args.scene)
    knn = knn_mean_dist(scene.xyz, config.knn_points)
    model = init_from_points(
        scene.xyz, knn, opacity_init=config.opacity_init,
        sh_degree=config.sh_degree, c00=config.sh_c00,
    )
    os.makedirs(args.out, exist_ok=True)
    trainer = Trainer(model, ds, config)
    if args.resume:
        from simplegaussiansplat_tk71_tpu.train.checkpoint import latest_checkpoint

        latest = latest_checkpoint(args.out)
        if latest:
            step = trainer.restore(latest)
            print(f"resumed from {latest} at step {step}")
    trainer.train(
        num_steps=args.steps or config.iterations,
        checkpoint_dir=args.out,
        metrics_path=os.path.join(args.out, "metrics.jsonl"),
        render_dir=os.path.join(args.out, "renders"),
    )


def cmd_synthetic_train(args):
    """Self-contained training demo: fit a perturbed model to a rendered GT."""
    import jax.numpy as jnp

    from simplegaussiansplat_tk71_tpu.data.colmap import ColmapScene
    from simplegaussiansplat_tk71_tpu.data.dataset import SceneDataset
    from simplegaussiansplat_tk71_tpu.models.gaussians import init_from_points
    from simplegaussiansplat_tk71_tpu.render import RenderConfig, render
    from simplegaussiansplat_tk71_tpu.train.trainer import Trainer

    config = _config_from_args(args)
    n, m = args.gaussians, args.cams
    W = H = args.size
    rng = np.random.default_rng(config.seed)
    xyz = (rng.normal(size=(n, 3)) * 0.8).astype(np.float32)
    xyz[:, 2] += 4.0
    gt = init_from_points(xyz, np.full(n, 0.1, np.float32))
    sh = np.array(gt.sh)
    sh[0:3, :n] = rng.uniform(0.5, 3.0, size=(n, 3)).T
    gt = gt._replace(sh=jnp.asarray(sh))
    f = 1.2 * W
    Ps, Ks = [], []
    for i in range(m):
        ang = 2 * np.pi * i / m * 0.15
        c, s = np.cos(ang), np.sin(ang)
        R = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32)
        # camera spread sets the densify scene extent; keep it comfortably
        # above 10x the gaussian scales or the size-prune rule
        # (max scale > 0.1 * extent, gs_model.py:252) wipes the model
        t = np.array([4.0 * (i - m / 2) / m, 0, 0], np.float32)
        Ps.append(np.concatenate([R, t[:, None]], 1))
        Ks.append(np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]], np.float32))
    P, K = np.stack(Ps), np.stack(Ks)
    rcfg = RenderConfig(
        tile_size=config.tile_size, max_per_tile=config.max_per_tile,
        tile_chunk=config.tile_chunk,
    )
    images, _ = render(gt, jnp.asarray(P), jnp.asarray(K), (W, H), rcfg)
    scene = ColmapScene(
        xyz=xyz, rgb=np.zeros((n, 3), np.uint8), P=P, K=K,
        wh=np.tile([[W, H]], (m, 1)).astype(np.int32),
        image_names=[f"cam{i}" for i in range(m)],
    )
    ds = SceneDataset(scene, images=np.asarray(images))
    model = init_from_points(xyz, np.full(n, 0.1, np.float32))
    trainer = Trainer(model, ds, config)
    trainer.train(num_steps=args.steps)
    if args.out:
        os.makedirs(args.out, exist_ok=True)
        out, _ = render(
            trainer.model, jnp.asarray(P[:1]), jnp.asarray(K[:1]), (W, H), rcfg
        )
        from PIL import Image

        arr = np.asarray(jnp.clip(out[0], 0, 1) * 255).astype(np.uint8)
        Image.fromarray(arr).save(os.path.join(args.out, "fit.png"))
        arr = np.asarray(jnp.clip(images[0], 0, 1) * 255).astype(np.uint8)
        Image.fromarray(arr).save(os.path.join(args.out, "gt.png"))
        print(f"wrote {args.out}/fit.png and gt.png")


def _load_model_any(path):
    """Model from a .npz checkpoint, official-3DGS .ply, or a reference
    .pt directory."""
    import jax.numpy as jnp

    from simplegaussiansplat_tk71_tpu.models.gaussians import GaussianModel
    from simplegaussiansplat_tk71_tpu.train.checkpoint import load_reference_pt

    if path.endswith(".ply"):
        from simplegaussiansplat_tk71_tpu.data.ply import load_ply

        return load_ply(path)
    if path.endswith(".npz"):
        data = np.load(path)
        return GaussianModel(
            mean=jnp.asarray(data["model.mean"]),
            quat=jnp.asarray(data["model.quat"]),
            log_scale=jnp.asarray(data["model.log_scale"]),
            logit_opacity=jnp.asarray(data["model.logit_opacity"]),
            sh=jnp.asarray(data["model.sh"]),
            alive=jnp.asarray(data["model.alive"]),
        )
    return load_reference_pt(path)


def cmd_eval(args):
    """PSNR/SSIM over the scene's cameras (the quality report the reference
    never produces — its only signal is the training-loss print)."""
    import jax.numpy as jnp

    from simplegaussiansplat_tk71_tpu.data.colmap import load_colmap_scene
    from simplegaussiansplat_tk71_tpu.data.dataset import SceneDataset
    from simplegaussiansplat_tk71_tpu.render import RenderConfig, render
    from simplegaussiansplat_tk71_tpu.utils.metrics import psnr, ssim

    model = _load_model_any(args.checkpoint)
    scene = load_colmap_scene(args.scene)
    ds = SceneDataset(scene, root_dir=args.scene)
    W, H = ds.img_wh
    cfg = RenderConfig()
    rows = []
    count = min(args.count or len(scene.P), len(scene.P))
    for i in range(count):
        img, _ = render(
            model, jnp.asarray(scene.P[i : i + 1]),
            jnp.asarray(scene.K[i : i + 1]), (W, H), cfg,
        )
        gt = jnp.asarray(ds.get_images([i]))
        # mixed-size scenes render at the padded max size; score each camera
        # on its true region only (host-side crop, shapes may vary per i)
        wi, hi = int(scene.wh[i, 0]), int(scene.wh[i, 1])
        img = img[:, :hi, :wi]
        gt = gt[:, :hi, :wi]
        p = float(psnr(img, gt))
        s = float(ssim(jnp.moveaxis(img, -1, 1), jnp.moveaxis(gt, -1, 1)))
        rows.append((scene.image_names[i], p, s))
        print(f"{scene.image_names[i]}: psnr={p:.2f} ssim={s:.4f}")
    ps = np.array([r[1] for r in rows])
    ss = np.array([r[2] for r in rows])
    print(f"mean over {len(rows)}: psnr={ps.mean():.2f} ssim={ss.mean():.4f}")


def cmd_render(args):
    import jax.numpy as jnp

    from simplegaussiansplat_tk71_tpu.data.colmap import load_colmap_scene
    from simplegaussiansplat_tk71_tpu.render import RenderConfig, render

    model = _load_model_any(args.checkpoint)
    scene = load_colmap_scene(args.scene)
    W, H = int(scene.wh[0, 0]), int(scene.wh[0, 1])
    os.makedirs(args.out, exist_ok=True)
    from PIL import Image

    for i in range(min(args.count, len(scene.P))):
        img, _ = render(
            model, jnp.asarray(scene.P[i : i + 1]), jnp.asarray(scene.K[i : i + 1]),
            (W, H), RenderConfig(),
        )
        arr = np.asarray(np.clip(np.asarray(img[0]), 0, 1) * 255).astype(np.uint8)
        Image.fromarray(arr).save(os.path.join(args.out, f"render_{i:04d}.png"))
    print(f"wrote {min(args.count, len(scene.P))} renders to {args.out}")


def cmd_export_ply(args):
    from simplegaussiansplat_tk71_tpu.data.ply import save_ply

    model = _load_model_any(args.checkpoint)
    n = save_ply(args.out, model)
    print(f"wrote {n} gaussians (sh degree {model.sh_degree}) to {args.out}")


def main(argv=None):
    parser = argparse.ArgumentParser(prog="sgs-tpu")
    sub = parser.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("info", help="inspect a COLMAP scene")
    p.add_argument("--scene", required=True)
    p.set_defaults(fn=cmd_info)

    p = sub.add_parser("train", help="train on a COLMAP scene")
    p.add_argument("--scene", required=True)
    p.add_argument("--out", default="checkpoints")
    p.add_argument("--steps", type=int, default=None)
    p.add_argument("--resume", action="store_true",
                   help="resume from the latest checkpoint in --out")
    _add_config_flags(p)
    p.set_defaults(fn=cmd_train)

    p = sub.add_parser("synthetic-train", help="self-contained training demo")
    p.add_argument("--gaussians", type=int, default=2000)
    p.add_argument("--cams", type=int, default=8)
    p.add_argument("--size", type=int, default=128)
    p.add_argument("--steps", type=int, default=100)
    p.add_argument("--out", default=None)
    _add_config_flags(p)
    p.set_defaults(fn=cmd_synthetic_train)

    p = sub.add_parser("render", help="render views from a checkpoint")
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--scene", required=True)
    p.add_argument("--out", default="renders")
    p.add_argument("--count", type=int, default=5)
    p.set_defaults(fn=cmd_render)

    p = sub.add_parser(
        "export-ply",
        help="export a checkpoint as official-3DGS PLY (viewer interchange)",
    )
    p.add_argument("--checkpoint", required=True,
                   help=".npz checkpoint or reference .pt directory")
    p.add_argument("--out", required=True, help="output .ply path")
    p.set_defaults(fn=cmd_export_ply)

    p = sub.add_parser("eval", help="PSNR/SSIM over scene cameras")
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--scene", required=True)
    p.add_argument("--count", type=int, default=None)
    p.set_defaults(fn=cmd_eval)

    args = parser.parse_args(argv)

    # persistent compilation cache: densify capacity growth recompiles the
    # train step at each new bucket (60 s - 17 min over a tunneled TPU);
    # restarts and resumes replay those compiles from disk instead. Opt out
    # with SGS_TPU_CACHE_DIR="".
    cache_dir = os.environ.get(
        "SGS_TPU_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "sgs_tpu_xla"),
    )
    if cache_dir:
        import jax

        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
