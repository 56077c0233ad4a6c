"""Float64 torch replay of the public SMPL/smplx LBS semantics.

Purpose (VERDICT task 4): an independent, high-precision oracle with the exact
storage conventions of the official smplx stack, so that `convert_smpl_pickle`
+ `load_smpl_npz` + `smpl_forward` can be validated at ≤1e-5 the day a real
`basicmodel_*.pkl` is available — and, until then, against synthetic models
saved in the real storage layout.

This is NOT the smplx source: it is a from-scratch float64 implementation of
the published LBS math (Loper et al., SMPL, SIGGRAPH Asia 2015) using 4×4
homogeneous transforms (jrr_tpu uses an unrolled 3×3+t formulation — the two
agreeing is a structural cross-check, not a copy). Conventions replicated:

- posedirs stored (V, 3, 9*(J-1)) in the pickle; consumed as
  (9*(J-1), V*3) via reshape(-1, basis).T   [smplx lbs.py storage order]
- pose blendshape feature = vec(R_k − I) for k=1..J-1, row-major 3×3
- rest joints = J_regressor @ v_shaped (betas applied FIRST)
- FK over kintree with relative offsets, skinning transforms
  A_k = G_k − [0 | G_k_rot · j_rest_k]  (the "remove rest pose" correction)
- axis-angle → rotation matrices via Rodrigues when pose2rot=True
- 45-joint smplx output = 24 FK joints ++ 21 selected vertices
  (5 face, 6 feet, 10 fingertips — smplx VertexJointSelector order)
- SPIN wrapper: ++ 9 extra regressed joints, then the 49-entry JOINT_MAP
  gather (reference: scripts/smpl.py:61-90)
"""

from __future__ import annotations

import numpy as np
import torch


def rodrigues(aa: torch.Tensor) -> torch.Tensor:
    """(..., 3) axis-angle → (..., 3, 3) rotation matrices, float64-safe."""
    angle = torch.linalg.norm(aa + 1e-18, dim=-1, keepdim=True)  # smplx's eps guard
    axis = aa / angle
    x, y, z = axis.unbind(-1)
    zero = torch.zeros_like(x)
    k = torch.stack(
        [zero, -z, y, z, zero, -x, -y, x, zero], dim=-1
    ).reshape(aa.shape[:-1] + (3, 3))
    s = torch.sin(angle)[..., None]
    c = torch.cos(angle)[..., None]
    eye = torch.eye(3, dtype=aa.dtype, device=aa.device).expand_as(k)
    return eye + s * k + (1.0 - c) * (k @ k)


def lbs_replay(
    betas: torch.Tensor,
    pose: torch.Tensor,
    v_template: torch.Tensor,
    shapedirs: torch.Tensor,
    posedirs_v3p: torch.Tensor,
    j_regressor: torch.Tensor,
    parents: np.ndarray,
    lbs_weights: torch.Tensor,
    pose2rot: bool,
):
    """Returns (vertices (B,V,3), fk_joints (B,J,3)), all float64.

    pose: (B, J*3) axis-angle when pose2rot else (B, J, 3, 3) rotmats.
    posedirs_v3p: (V, 3, 9*(J-1)) — the PICKLE storage order.
    """
    b = betas.shape[0]
    num_j = j_regressor.shape[0]
    dt = torch.float64
    v_template = v_template.to(dt)
    shapedirs = shapedirs.to(dt)
    j_regressor = j_regressor.to(dt)
    lbs_weights = lbs_weights.to(dt)

    # Shape blendshapes, then rest joints from the SHAPED vertices.
    v_shaped = v_template[None] + torch.einsum("bl,vcl->bvc", betas.to(dt), shapedirs)
    j_rest = torch.einsum("jv,bvc->bjc", j_regressor, v_shaped)  # (B, J, 3)

    if pose2rot:
        rot = rodrigues(pose.to(dt).reshape(b, num_j, 3))
    else:
        rot = pose.to(dt)
    ident = torch.eye(3, dtype=dt)
    pose_feature = (rot[:, 1:] - ident).reshape(b, -1)  # (B, 9*(J-1))
    basis = posedirs_v3p.shape[-1]
    posedirs_flat = posedirs_v3p.to(dt).reshape(-1, basis).T  # (9*(J-1), V*3)
    v_posed = v_shaped + (pose_feature @ posedirs_flat).reshape(b, -1, 3)

    # FK with 4x4 homogeneous transforms.
    def hom(r, t):
        m = torch.zeros(r.shape[:-2] + (4, 4), dtype=dt)
        m[..., :3, :3] = r
        m[..., :3, 3] = t
        m[..., 3, 3] = 1.0
        return m

    rel = j_rest.clone()
    rel[:, 1:] = j_rest[:, 1:] - j_rest[:, parents[1:]]
    g = [hom(rot[:, 0], rel[:, 0])]
    for k in range(1, num_j):
        g.append(g[parents[k]] @ hom(rot[:, k], rel[:, k]))
    g = torch.stack(g, dim=1)  # (B, J, 4, 4)
    fk_joints = g[..., :3, 3]

    # Remove the rest pose: A_k = G_k - [0 | G_k_rot @ j_rest_k].
    corr = torch.einsum("bjik,bjk->bji", g[..., :3, :3], j_rest)
    a = g.clone()
    a[..., :3, 3] = g[..., :3, 3] - corr

    t_vert = torch.einsum("vj,bjik->bvik", lbs_weights, a)  # (B, V, 4, 4)
    v_h = torch.cat([v_posed, torch.ones_like(v_posed[..., :1])], dim=-1)
    verts = torch.einsum("bvik,bvk->bvi", t_vert, v_h)[..., :3]
    return verts, fk_joints


# smplx VertexJointSelector vertex ids (SMPL topology): 5 face, 6 feet,
# 10 fingertips — public model facts, same order the selector concatenates.
SMPLX_EXTRA_VERTEX_IDS = (
    332, 6260, 2800, 4071, 583,
    3216, 3226, 3387, 6617, 6624, 6787,
    2746, 2319, 2445, 2556, 2673,
    6191, 5782, 5905, 6016, 6133,
)

# The SPIN wrapper's 49-entry gather over [45 smplx ++ 9 extra] joints
# (values of reference scripts/smpl.py:12-49 JOINT_MAP in JOINT_NAMES order).
SPIN_JOINT_MAP_49 = (
    24, 12, 17, 19, 21, 16, 18, 20, 0, 2, 5, 8, 1, 4, 7, 25, 26, 27, 28, 29, 30,
    31, 32, 33, 34, 8, 5, 45, 46, 4, 7, 21, 19, 17, 16, 18, 20, 47, 48, 49, 50,
    51, 52, 53, 24, 26, 25, 28, 27,
)


def spin49_replay(
    verts: torch.Tensor, fk_joints: torch.Tensor, j_regressor_extra: torch.Tensor
) -> torch.Tensor:
    """(B, 49, 3) SPIN-convention joints from the LBS replay outputs."""
    sel = verts[:, list(SMPLX_EXTRA_VERTEX_IDS)]
    extra = torch.einsum("jv,bvc->bjc", j_regressor_extra.to(verts.dtype), verts)
    all_joints = torch.cat([fk_joints, sel, extra], dim=1)  # (B, 54, 3)
    return all_joints[:, list(SPIN_JOINT_MAP_49)]
