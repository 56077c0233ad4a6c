"""Frozen dataclass configuration for the whole pipeline.

Replaces the reference's import-time argparse globals (reference:
scripts/args.py:3-103, parsed at import on line 100) with side-effect-free
frozen dataclasses. Hyperparameter defaults mirror the *effective* values of
the reference run (several reference flags are dead or ignored; the loop
counts below are the hardcoded ones at scripts/optimize.py:190,220 rather than
the unused --opt_steps flag).
"""

from __future__ import annotations

import dataclasses
from typing import Optional


@dataclasses.dataclass(frozen=True)
class CameraConfig:
    """Perspective camera conventions (reference: scripts/renderer.py:18-20,35-37)."""

    focal_length: float = 5000.0
    image_size: int = 224
    # SMPL-frame -> camera-frame conversion applied before projection
    # (reference: scripts/renderer.py:35-37 — x,y negated, all coords doubled).
    flip_scale: tuple = (-2.0, -2.0, 2.0)


@dataclasses.dataclass(frozen=True)
class SilhouetteConfig:
    """Soft-silhouette rasterizer settings (reference: scripts/mesh_renderer.py:28-38)."""

    image_size: int = 224
    # Blend sigma in NDC^2 units, as pytorch3d BlendParams(sigma=1e-4).
    sigma: float = 1e-4
    # Distance band (NDC^2) outside a face within which coverage is computed.
    # The reference uses blur_radius=0.0 (hard edges, gradients only from the
    # inside band of each edge — the mask can never pull the mesh OUTWARD).
    # Default 1e-4 is quality-validated by measurement (BASELINE.md round 3,
    # tools/silhouette_quality.py: full-size production regime, shape-mismatch
    # init — final MPJPE 14.5 → 8.7 mm, mean vertex error 27.6 → 19.2 mm vs
    # blur 0, at negligible step cost). Set 0.0 for reference-exact semantics.
    blur_radius: float = 1e-4
    # Static per-tile face-list capacity for the binned rasterizer.
    faces_per_tile: int = 96
    tile_size: int = 8
    # Re-bin the candidate face lists every N refinement steps (1 = every
    # step). Vertices drift by fractions of a pixel per Adam step, so with
    # `bin_margin_px` of slack the lists stay covering — binning cost
    # amortizes away.
    # Defaults set by TPU quality probes: round 2 measured interval 20 /
    # margin 6 matching per-step binning within 0.3% final silhouette loss;
    # the round-3 full-size production probe (tools/silhouette_quality.py,
    # BASELINE.md round-3 table) then validated interval 50 / margin 8 at
    # quality parity (MPJPE 9.39 vs 9.5 mm, IoU 0.75 vs 0.69) while cutting
    # amortized binning cost 2.5× (32.6 → ~42 frames/s/chip with stride 2).
    # Margin-only candidates sort behind intersecting ones, so extra slack
    # never evicts coverage.
    rebin_interval: int = 50
    bin_margin_px: float = 8.0
    # Max tiles per axis a face's padded bbox may span in sort-based binning.
    max_tiles_per_face: int = 4
    # Fused page-gather rasterizer: vertex pages per tile (incl. dump slot).
    pages_per_tile: int = 16
    # Rasterizer implementation: "fused" (page-gather kernel, round 2),
    # "pallas" (round-1 kernel + XLA gather glue), "xla" (lax.map tile loop).
    # "auto" = fused on TPU, xla-twin elsewhere.
    backend: str = "auto"
    # Evaluate the silhouette term every Nth stage-B step only (weight × N on
    # active steps keeps the average gradient contribution; inactive steps
    # skip the rasterizer entirely via lax.cond). The silhouette is a
    # slowly-varying shape constraint, so striding amortizes it exactly like
    # rebinning. Default 2 measured at +57% end-to-end throughput (21.1 →
    # 33.0 frames/s/chip) for ≤0.9 mm final vertex error vs stride 1
    # (BASELINE.md round 3). 1 = reference behavior (every step).
    step_stride: int = 2
    # Stride override for the COARSE c2f phase only (None → step_stride).
    # The coarse phase is a basin-widener — its silhouette signal positions
    # the body roughly while the fine phase does band-scale polish — so it
    # tolerates sparser striding than the fine phase. Default 4 shipped by
    # the round-4 TPU gate (BASELINE.md round-4 stride table): +19.7%
    # end-to-end (44.6 → 53.4 frames/s/chip) for +0.37 mm final MPJPE /
    # +0.43 mm vertex at slightly BETTER IoU on the production (mocap-
    # anchored) objective — the reference's actual workload (j3d weight 1e4,
    # scripts/optimize.py:252). CAVEAT, measured and recorded: in the
    # mocap-less (no-j3d) robustness regime the sparser coarse signal hurts
    # (MPJPE 21.1 → 24.2 mm) — pipelines without a 3D anchor should set
    # coarse_step_stride=None. Uniform stride 3 was REJECTED in the same
    # session (+30% but +1.24 mm MPJPE — past every previously accepted
    # quality delta).
    coarse_step_stride: Optional[int] = 4
    # Scheduled FINE-phase striding: the first floor(fine_warm_frac ·
    # fine_steps) steps of the fine (full-resolution) phase stride at
    # fine_warm_stride; the remaining polish steps stride at step_stride.
    # Rationale: right after the coarse→fine handoff the mesh is still
    # basin-scale away from the mask, so the early fine steps tolerate the
    # same sparse cadence the coarse phase does — only the final band-scale
    # polish needs density. Active steps scale the term by their CURRENT
    # stride, so the average silhouette contribution is preserved across the
    # schedule when warm_steps is a multiple of fine_warm_stride; otherwise
    # the warm band over-contributes by up to (stride−1)/warm_steps (e.g.
    # warm_steps=10 at stride 4 fires 3 actives × scale 4 = 12 units over 10
    # steps, +20% within the warm band). None/0.0 = off (uniform step_stride,
    # the round-3 behavior).
    # When c2f is off, the schedule applies across all of stage B.
    # Default OFF pending a TPU quality+perf gate (BASELINE.md round 4).
    fine_warm_frac: float = 0.0
    fine_warm_stride: Optional[int] = None
    # Coarse-to-fine stage B: the FIRST floor(coarse_frac · stage_b_steps)
    # steps rasterize at image_size/coarse_factor — tile_size and bin margin
    # divided by the same factor, so occupied-tile and per-tile candidate
    # counts match the full-resolution setup while pixel rows per tile drop
    # factor² (64 → 16 sublanes at factor 2) — then the rest run at full
    # resolution. Mask is mean-pooled on device; focal auto-scales via
    # losses.rasterizer_spec; both phases chain inside ONE XLA program. The
    # wider coarse basin IMPROVES final quality at lower cost (TPU probe,
    # tools/c2f_probe.py / BASELINE.md round 3: at 224²→112², coarse half,
    # MPJPE 7.9 vs 9.4 mm, vertex 18.1 vs 20.2 mm vs single-resolution,
    # identical IoU). Adam state is fresh per phase (same per-batch-fresh
    # semantics as the reference). coarse_frac=0.0 restores the
    # single-resolution round-2 behavior. Margin dividing with resolution
    # keeps face bbox spans within max_tiles_per_face at the smaller tile.
    coarse_frac: float = 0.5
    coarse_factor: int = 2
    # Interior-saturated-tile skip: at each rebin, tiles whose rendered alpha
    # is SATURATED (exactly 0 or 1 in f32 across the tile and a
    # bin_margin_px-wide neighborhood) are marked kernel-empty — they carry
    # numerically zero vertex gradient, and their loss contribution is
    # reconstructed outside the kernel (silhouette_fused.apply_interior_skip).
    # This is the "fewer occupied tiles" lever from the round-3 in-kernel
    # cost attribution (BASELINE.md): body-interior tiles are ~half the
    # occupied set at 224². Skips are counted in
    # BinStats.interior_skipped_tiles. Three-state:
    #   None (default) — AUTO: on whenever the fused backend + rebin
    #     amortization are active (the only path the skip exists on), off
    #     otherwise (e.g. the off-TPU XLA twin, rebin_interval=1);
    #   True — REQUIRE: raise if the fused amortized path is unavailable
    #     (never-silent: a probe labeled "interior_skip" must not silently
    #     record baseline behavior);
    #   False — off.
    # Auto-ON by the round-3 TPU gate (BASELINE.md): +7.1% end-to-end
    # throughput (44.7 vs 41.7 frames/s/chip) at quality parity on the
    # full-size production probe (MPJPE 7.67 vs 7.87 mm, vertex 17.98 vs
    # 18.11 mm, IoU 0.698 vs 0.696) — and the same neutral-to-slightly-better
    # picture in the mocap-less (no-j3d) regime.
    interior_skip: Optional[bool] = None
    # Lane packing (round 4): two sparse tiles (core candidate count ≤ 64)
    # share one 128-lane kernel row — K_pad=128 is one VREG width, so each
    # packed pair halves its VPU tile-steps (silhouette_fused.pack_bins).
    # Packed tiles keep all CORE candidates + the nearest margin candidates
    # up to 64 (margin is distance-ordered in the binning sort); pairs whose
    # page-list union exceeds P̂−1 are left unpacked. Only the one-pass
    # loss+grad kernel consumes the packed layout. Default set by the
    # round-4 TPU gate (BASELINE.md round 4).
    lane_pack: bool = False
    # Quality floor: c2f engages only when image_size/coarse_factor >= this.
    # Below it, coarse supervision is too crude and actively HURTS (measured:
    # at 64²→32² on the toy problem the silhouette run ends WORSE than no
    # silhouette at all, tests/test_silhouette_quality.py; at 224²→112²
    # full-size it is a strict quality win). 112 is the validated point.
    coarse_min_image: int = 112


@dataclasses.dataclass(frozen=True)
class LossWeights:
    """Stage-B loss weights (reference: scripts/optimize.py:252-253)."""

    j2d: float = 1.0 / 100.0
    silhouette: float = 100.0
    j3d: float = 10000.0
    pose_disc: float = 10.0
    shape_disc: float = 10.0


@dataclasses.dataclass(frozen=True)
class RefinerConfig:
    """Two-stage Adam refinement schedule (reference: scripts/optimize.py:187-265)."""

    stage_a_steps: int = 1000  # camera-only 2D alignment (optimize.py:190)
    stage_b_steps: int = 100  # full (θ, β, cam) refinement (optimize.py:220)
    stage_a_lr: float = 1e-2  # optimize.py:188
    stage_b_lr: float = 1e-2  # optimize.py:202
    loss_weights: LossWeights = dataclasses.field(default_factory=LossWeights)
    camera: CameraConfig = dataclasses.field(default_factory=CameraConfig)
    silhouette: SilhouetteConfig = dataclasses.field(default_factory=SilhouetteConfig)
    # Whether stage B includes the silhouette term (config[1] of BASELINE.json
    # omits it; config[3] includes it).
    use_silhouette: bool = True
    use_discriminators: bool = True


@dataclasses.dataclass(frozen=True)
class DiscriminatorConfig:
    """Adversarial prior training (reference: scripts/optimize.py:276-293, scripts/args.py:13)."""

    lr: float = 1e-3  # --opt_disc_learning_rate default


@dataclasses.dataclass(frozen=True)
class JRegConfig:
    """Joint-regressor training (reference: scripts/optimize.py:300-312, scripts/args.py:15)."""

    lr: float = 1e-2  # --j_reg_lr default
    # Ridge regularizer for the least-squares fit path (TPU-idiomatic
    # alternative to per-batch SGD; no reference equivalent).
    lstsq_ridge: float = 1e-4
    # Every N shards, snapshot the Adam-path regressor (state.j_reg_raw) to
    # out_dir/jreg_snapshots/snap_<shard>.npz via the async writer queue —
    # the convergence-vs-batches observability the reference's (silently
    # no-op) J-reg training never had. The ~470 KB device pull rides the
    # writer thread, so the cadence does not stall dispatch. None = off.
    snapshot_interval: Optional[int] = None


@dataclasses.dataclass(frozen=True)
class DataConfig:
    """Input pipeline (reference: scripts/data.py:28-163)."""

    root: str = "data/human3.6m"
    batch_size: int = 256  # --batch_size default (scripts/args.py:8)
    shuffle_seed: int = 0
    prefetch: int = 2
    # Optimization passes over the dataset (reference: --train_epochs,
    # scripts/args.py:7; effective value 1). Each epoch reshuffles.
    train_epochs: int = 1
    # Which split the optimizer consumes. The reference optimizes over the
    # validation split (scripts/optimize.py:133); the train split exists at
    # scripts/data.py:50-69 and is selectable here.
    split: str = "validation"


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    """Device-mesh / sharding settings (no reference equivalent — the
    reference is single-GPU; see SURVEY §2c)."""

    data_axis: str = "data"
    num_devices: Optional[int] = None  # None = all local devices


@dataclasses.dataclass(frozen=True)
class PipelineConfig:
    refiner: RefinerConfig = dataclasses.field(default_factory=RefinerConfig)
    discriminator: DiscriminatorConfig = dataclasses.field(default_factory=DiscriminatorConfig)
    jreg: JRegConfig = dataclasses.field(default_factory=JRegConfig)
    data: DataConfig = dataclasses.field(default_factory=DataConfig)
    mesh: MeshConfig = dataclasses.field(default_factory=MeshConfig)
    seed: int = 0
    num_betas: int = 10
