"""Training configuration.

Defaults are the reference's "simple mode" values (gs_control.py:24-49), which
mirror the official-3DGS hyperparameters preserved in its comments
(gs_control.py:69-92). The reference configures itself through interactive
stdin prompts; here it is a dataclass usable from code, CLI flags, or JSON.
"""

import dataclasses
import json
from typing import Optional


@dataclasses.dataclass
class TrainConfig:
    # schedule (gs_control.py:25-38)
    iterations: int = 30_000
    batch_size: int = 3  # gs_control.py:107
    densify_from_iter: int = 500
    densify_until_iter: int = 15_000  # round(iterations / 2), gs_control.py:30
    densification_interval: int = 100
    opacity_reset_interval: int = 3000
    # 0 = reference parity: resets fire for the WHOLE run (gs_control.py:
    # 206-207 applies the reset outside the densify gate — including on the
    # final step). >0 = official-3DGS gating: resets fire only while
    # step < opacity_reset_until (official resets live inside the densify
    # block, i.e. while iteration < densify_until_iter). Gating by step —
    # rather than zeroing opacity_reset_interval at runtime — keeps the
    # interval-derived size_active big-point prunes (trainer.run_step) alive
    # through the rest of the densify phase, matching official 3DGS.
    opacity_reset_until: int = 0

    # loss (gs_control.py:29, :180-182)
    loss_lambda: float = 0.2
    ssim_window: int = 11

    # init (gs_control.py:27-28, :111-118)
    knn_points: int = 3
    opacity_init: float = 0.1
    sh_degree: int = 2  # L_max, gs_model.py:139
    sh_c00: float = 1.77  # gs_model.py:139

    # densify thresholds (gs_control.py:31-35)
    grad_threshold: float = 0.0004  # limit_upper_grad (3-D stat, reference)
    grad_delta_upper_limit: float = 1e-12  # gs_control.py:31 (distinct from
    # grad_threshold; unused by densify today, surfaced via HyperState)
    percent_dense: float = 0.01
    prune_min_opacity: float = 0.005
    reset_opacity_min: float = 0.01
    split_n: int = 2  # gs_model.py:201

    # densify control (round-3 overhaul — VERDICT round 2 "next" #1; the
    # reference's 3-D statistic with inherited accumulators diverged at scale)
    densify_stat: str = "grad2d"  # "grad2d" (official 3DGS) | "grad3d" (ref)
    grad2d_threshold: float = 0.0002  # official densify_grad_threshold
    max_screen_size: float | None = 20.0  # px; screen prune after 1st opacity
    # reset (official big-point prune); None disables
    max_alive: int | None = 4_000_000  # absolute population cap
    growth_limit: float | None = 2.0  # per-event alive growth cap (x)
    preserve_adam_on_densify: bool = True  # keep survivors' Adam moments
    # (official cat_tensors_to_optimizer; False = reference full rebuild)
    adapt_max_per_tile: bool = True  # double K when truncation persists
    max_per_tile_limit: int = 8192  # ceiling for the adaptation (round-4:
    # was 2048, which the r3b quality run hit while still dropping ~2.3k
    # fragments/step — VERDICT round-3 "next" #3 treats truncated > 0 as a
    # failed invariant, so the ceiling now sits far above observed demand;
    # seg_len early-out keeps large K cheap on sparse tiles)
    adapt_trunc_per_step: float = 1000.0  # dropped-fragments/step that
    # triggers the doubling (a recompile is worth ~1k wrong gradients/step)
    adapt_trunc_final_per_step: float = 0.0  # stricter trigger once
    # densification has ended (step > densify_until_iter): any persistent
    # truncation in the final phase would land in the artifact's
    # truncated_last_1k_steps — drive it to exactly zero
    adapt_max_pairs: bool = True  # double max_pairs when the global pair
    # buffer overflows (dropped_pairs > 0): overflow drops whole
    # gaussian-tile pairs, corrupting images AND gradients; checked at
    # densify events and every densification_interval after densify ends
    max_pairs_limit: int = 16_000_000  # ceiling for max_pairs adaptation

    # debug: checkify float_checks over the whole train step (raises on the
    # first NaN/Inf with op location). The reference's check_nan helper with
    # its call sites commented (gs_model.py:822-829), actually wired up.
    debug_nan_checks: bool = False

    # learning rates (gs_control.py:42-49)
    position_lr_init: float = 0.00016
    position_lr_final: float = 0.0000016
    position_lr_delay_mult: float = 0.01
    position_lr_max_steps: int = 30_000
    feature_lr: float = 0.0025
    opacity_lr: float = 0.025
    scaling_lr: float = 0.005
    rotation_lr: float = 0.001

    # renderer
    tile_size: int = 16
    max_per_tile: int = 512
    max_pairs: Optional[int] = None
    tile_chunk: int = 64
    bbox_max_frac: float = 0.4  # tile_max_width quirk, gs_model.py:364-365
    # None = auto: fused Pallas kernels on TPU, jnp path on CPU
    use_pallas: Optional[bool] = None
    # pallas kernel knobs (RenderConfig counterparts; see render.py)
    morton_reorder: bool = False  # Z-order gaussians at densify events
    depth_block: Optional[int] = None  # blocked kernel w/ early-out
    t_eps: float = 1e-4  # early-out transmittance threshold
    cull_alpha_min: float = 0.0  # per-pair alpha-floor culling (1/255 = 3DGS)
    pair_grad_route: bool = True  # pair-space gradient routing

    # behavior quirks
    reset_adam_every_step: bool = False  # reference does this (gs_control.py:199)
    # official 3DGS applies BOTH big-point prunes — screen radius AND the
    # world-size max(scale) > 0.1*extent — only once size_threshold is set,
    # i.e. after the first opacity reset. The reference applies the
    # world-size prune at EVERY event (gs_model.py:250-253); at small camera
    # extents that deletes the whole population at the first event (the kNN
    # init scale alone can exceed 0.1*extent). True = reference parity.
    world_prune_always: bool = False
    # official 3DGS zeroes the accumulators at every densify event; the
    # reference never resets (SURVEY 3.3) — that positive-feedback loop is
    # what exploded the round-2 quality run, so the official behavior is now
    # the default (False = reference parity)
    reset_stats_after_densify: bool = True
    # geometric capacity headroom on growth (amortizes jit recompiles on TPU,
    # where each new capacity costs a 60-170 s remote compile; 1.0 = tightest)
    capacity_growth: float = 1.0

    # io
    checkpoint_every: int = 1000  # gs_control.py:226
    seed: int = 0

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2)

    @classmethod
    def from_json(cls, text: str) -> "TrainConfig":
        return cls(**json.loads(text))
