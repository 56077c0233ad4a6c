"""Per-tile candidate-count distribution on the bench-shaped scene (CPU).

Motivation: the fused rasterizer kernels process each occupied tile as a
(t², K_pad=128) block — K_pad is exactly one VREG lane width, so per-tile
cost is flat in the true candidate count (BASELINE.md "lane floor"). The one
remaining lane-axis restructure is packing TWO tiles' candidate lists side by
side in the 128-lane row (64 lanes each), halving vregs per tile for tiles
with ≤64 candidates. Whether that is live or dead depends on the occupancy
distribution of OCCUPIED tiles at the shipped geometry: if most occupied
tiles exceed 64 candidates, packing would mass-truncate and the idea is dead.

This probe reproduces the binning count semantics of
`silhouette_fused._fused_bins_one` (core+margin candidates per tile, before
K-truncation) in numpy on the bench scene at both c2f phases' geometry and
prints the distribution. Pure measurement tool; no library changes.

Usage: python tools/occupancy_probe.py [--batch 8]
"""

from __future__ import annotations

import argparse
import json
import sys

import jax
import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

jax.config.update("jax_platforms", "cpu")


def tile_counts(verts_screen, faces, image_size, tile, pad_px, cap=4):
    """Per-tile candidate counts for one frame; mirrors the bbox/pad AND
    span-clip semantics of silhouette_fused._fused_bins_one: each face's tile
    window is clipped to `max_tiles_per_face` per axis anchored at the clipped
    tmin (silhouette_fused.py:180), so union counts here are what the kernel
    actually bins (ADVICE r3: the unclipped probe overstated union counts on
    faces spanning >cap tiles; core spans stay within the cap either way)."""
    g = image_size // tile
    fv = verts_screen[faces]  # (F, 3, 3)
    xy = fv[..., :2]
    valid = np.all(fv[..., 2] > 1e-6, axis=-1)
    fmin = np.min(xy, axis=1) - pad_px
    fmax = np.max(xy, axis=1) + pad_px
    tmin = np.floor(fmin / tile).astype(np.int32)
    tmax = np.floor(fmax / tile).astype(np.int32)
    on = valid & np.all(tmax >= 0, axis=1) & (tmin[:, 0] < g) & (tmin[:, 1] < g)
    counts = np.zeros((g, g), np.int64)
    t0 = np.clip(tmin, 0, g - 1)
    t1 = np.clip(tmax, 0, g - 1)
    t1 = np.minimum(t1, t0 + cap - 1)  # kernel's max_tiles_per_face span clip
    for f in np.nonzero(on)[0]:
        counts[t0[f, 1] : t1[f, 1] + 1, t0[f, 0] : t1[f, 0] + 1] += 1
    return counts.reshape(-1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    args = ap.parse_args()

    import __graft_entry__ as ge
    from jrr_tpu.render import camera as camera_lib
    from jrr_tpu.refine import losses

    model, j_reg, cfg, init, data = ge._synthetic_problem(
        batch=args.batch, num_verts=6890, image_size=224
    )
    out = losses.forward_frame(model, init)
    scfg = cfg.refiner.silhouette
    spec = losses.rasterizer_spec(cfg.refiner)

    report = {}
    for phase, (img, tile, margin) in {
        "fine": (224, 8, scfg.bin_margin_px),
        "coarse": (112, 4, scfg.bin_margin_px / 2),
    }.items():
        core_pad = 0.5 + img / 2.0 * float(np.sqrt(max(spec.blur_radius, 0.0)))
        pad_px = core_pad + margin
        focal = spec.focal_length * (img / 224.0)
        vs = np.asarray(
            camera_lib.project_points_screen(out.vertices, init.cam_t, img, focal)
        )
        faces = np.asarray(model.faces)
        allc = np.concatenate(
            [tile_counts(vs[b], faces, img, tile, pad_px) for b in range(args.batch)]
        )
        core = np.concatenate(
            [tile_counts(vs[b], faces, img, tile, core_pad) for b in range(args.batch)]
        )
        occ = allc[allc > 0]
        core_occ = core[allc > 0]  # core counts over the same occupied set
        qs = np.percentile(occ, [50, 75, 90, 95, 99]).round(1).tolist()
        cqs = np.percentile(core_occ, [50, 75, 90, 95, 99]).round(1).tolist()
        report[phase] = {
            "tiles_per_frame": int(allc.size // args.batch),
            "occupied_frac": round(float(occ.size / allc.size), 3),
            "union_p50_p75_p90_p95_p99": qs,
            "core_p50_p75_p90_p95_p99": cqs,
            "max_union": int(occ.max()),
            "max_core": int(core_occ.max()),
            "frac_core_le_48": round(float(np.mean(core_occ <= 48)), 3),
            "frac_core_le_64": round(float(np.mean(core_occ <= 64)), 3),
            "frac_core_gt_96": round(float(np.mean(core_occ > 96)), 3),
            # Lane-packing gates (ADVICE r3: gate on UNION counts, not core —
            # packed tiles hold core+margin, and margin slack interacts with
            # rebin quality): union ≤ 64 packs with EXACT semantics; core ≤ 64
            # packs with thinner drift slack (64 − core margin slots).
            "frac_union_le_64": round(float(np.mean(occ <= 64)), 3),
            "frac_union_le_96": round(float(np.mean(occ <= 96)), 3),
            "frac_union_le_128": round(float(np.mean(occ <= 128)), 3),
        }
    print(json.dumps(report))


if __name__ == "__main__":
    main()
