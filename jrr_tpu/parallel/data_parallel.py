"""Data-parallel wrappers for the refinement engine and outer training step.

Pattern: `jax.jit` with explicit `in_shardings`/`out_shardings` — frames
sharded over the mesh's data axis, shared state replicated. XLA emits the ICI
collectives (all-reduce for shared-state gradients and batch-mean metrics);
there is no hand-written communication (SURVEY §2c: this replaces, rather
than ports, a GPU collectives stack).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
from jax.sharding import Mesh

from jrr_tpu.config import PipelineConfig, RefinerConfig
from jrr_tpu.models import smpl as smpl_lib
from jrr_tpu.parallel import mesh as mesh_lib
from jrr_tpu.refine import engine, trainer


def _spec_like(tree, sharding):
    return jax.tree.map(lambda _: sharding, tree)


def make_sharded_refine(
    mesh: Mesh,
    cfg: RefinerConfig,
    freeze_hand_feet: bool = False,
):
    """jitted refine_batch with frames sharded over the mesh.

    Call as fn(model, j_reg_raw, init, data, pose_disc, shape_disc); model and
    shared state are replicated, init/data sharded on the frame axis.
    """
    rep = mesh_lib.replicated(mesh)
    shard = mesh_lib.batch_sharding(mesh)

    def step(model, j_reg_raw, init, data, pose_disc, shape_disc):
        return engine.refine_batch(
            model, j_reg_raw, init, data, cfg,
            pose_disc_params=pose_disc, shape_disc_params=shape_disc,
            freeze_hand_feet=freeze_hand_feet,
        )

    return jax.jit(
        step,
        in_shardings=(rep, rep, shard, shard, rep, rep),
        out_shardings=engine.RefineResult(
            params=shard, stage_a_loss=rep, stage_b_terms=rep,
            joints3d=shard, vertices=shard,
        ),
    )


def make_sharded_outer_step(mesh: Mesh, cfg: PipelineConfig):
    """jitted trainer.outer_step: state replicated (gradients all-reduced by
    XLA since the updated state must come out replicated), frames sharded."""
    rep = mesh_lib.replicated(mesh)
    shard = mesh_lib.batch_sharding(mesh)

    def step(state, model, spin_init, data):
        return trainer.outer_step(state, model, spin_init, data, cfg)

    return jax.jit(
        step,
        in_shardings=(rep, rep, shard, shard),
        out_shardings=(
            rep,
            rep,
            engine.RefineResult(
                params=shard, stage_a_loss=rep, stage_b_terms=rep,
                joints3d=shard, vertices=shard,
            ),
        ),
    )


def host_shard_slice(global_batch: int, num_hosts: int, host_id: int) -> slice:
    """Contiguous per-host slice of the global frame batch (host-sharded input
    pipeline; each host feeds its local devices)."""
    per = global_batch // num_hosts
    return slice(host_id * per, (host_id + 1) * per)
