"""End-to-end pipeline orchestration.

The equivalent of the reference's `main.py` flow (reference: main.py:13-27):
seed → optimize (refine + train regressor/discriminators over the dataset) →
protocol-2 evaluation before/after. Differences by design:

- every device-side step is one jitted sharded program (no per-iteration
  python in the hot path);
- refined pseudo-GT is written per shard with a manifest (restart skips
  completed shards; the reference has no persistence — SURVEY §5);
- the final regressor can come from the streaming Adam path (reference
  semantics) or the closed-form least-squares fit over all refined shards.
"""

from __future__ import annotations

import dataclasses
import os
import time
from typing import Dict, Iterable, Optional

import numpy as np

from jrr_tpu.config import PipelineConfig


@dataclasses.dataclass
class PipelineArtifacts:
    j_reg_initial: np.ndarray
    j_reg_final: np.ndarray
    j_reg_lstsq: Optional[np.ndarray]
    eval_before_after: "object"
    out_dir: str
    # kind ("vibe"/"meva" [+ " (sequence)"]) → BeforeAfter, when consumer
    # checkpoints were given (reference: main.py:26-27 runs both).
    consumer_evals: Dict[str, "object"] = dataclasses.field(default_factory=dict)


def _batch_to_device_inputs(batch: Dict[str, np.ndarray], spin_fn=None, cfg=None):
    """Host batch dict → (FrameParams init, FrameBatch data).

    With a SPIN model, initial estimates come from the network on the 224 crop
    (reference: scripts/optimize.py:164-182); otherwise from the stored
    orient/pose/betas/cam tensors (the reference's precomputed SPIN outputs).

    When `cfg` is given and the silhouette works at a smaller resolution than
    the stored mask (e.g. --demo), the mask is mean-pooled down to match —
    the rasterizer spec scales focal accordingly (losses.rasterizer_spec), so
    the pooled mask and the render stay pixel-aligned.
    """
    import jax.numpy as jnp

    from jrr_tpu.models import spin as spin_lib
    from jrr_tpu.refine import engine, losses

    mask = batch.get("mask_rcnn")
    if mask is not None and mask.ndim == 4:
        mask = mask[:, 0]
    if mask is not None and cfg is not None and cfg.refiner.use_silhouette:
        # Pool only when the term is live: with use_silhouette=False the mask
        # is never rendered against, so a non-divisible --silhouette-size
        # must not fail the run.
        target = cfg.refiner.silhouette.image_size
        src = mask.shape[-1]
        if src != target:
            if src % target != 0:
                raise ValueError(
                    f"mask resolution {src} is not an integer multiple of the "
                    f"silhouette size {target}"
                )
            f = src // target
            mask = mask.reshape(mask.shape[0], target, f, target, f).mean(axis=(2, 4))
    data = losses.FrameBatch(
        gt_j2d=jnp.asarray(batch["gt_j2d"]),
        gt_j3d=jnp.asarray(batch["gt_j3d"]),
        mask=None if mask is None else jnp.asarray(mask),
    )
    if spin_fn is not None:
        pose6d, betas, cam = spin_fn(
            spin_lib.normalize_image(jnp.asarray(batch["spin_image"]))
        )
        init = engine.spin_prediction_to_params(pose6d, betas, cam)
    else:
        init = losses.FrameParams(
            pose6d=jnp.asarray(batch["pose"]),
            orient6d=jnp.asarray(batch["orient"]).reshape(-1, 1, 6),
            betas=jnp.asarray(batch["betas"]),
            cam_t=jnp.asarray(batch["cam"]),
        )
    return init, data


# Periodic lstsq-accumulator checkpoint cadence (VERDICT r3 weak item 7):
# without it a resume near the end of a long run replays EVERY completed
# shard's SMPL forward to rebuild the normal-equation sums — O(dataset) work.
# The gram is (V, V) ≈ 190 MB at V=6890, so it is written every N shards and
# resume replays only the shards past the checkpoint. Shard↔batch pairing
# safety is inherited from the manifest's gt_j3d check on the replayed tail
# (same permutation ⇒ same prefix).
ACC_CKPT_EVERY = 16


# Module-level jitted replay (CLAUDE.md: reuse module-level jitted functions —
# per-call jax.jit lambdas recompile on every run_optimize invocation, and
# axon compiles run 10-400 s). Lazy so importing this module stays side-effect
# free; the model rides as a jit ARGUMENT, never a closure capture.
_REPLAY_VERTICES = None


def _replay_vertices():
    global _REPLAY_VERTICES
    if _REPLAY_VERTICES is None:
        import jax

        from jrr_tpu.refine import losses as losses_lib

        _REPLAY_VERTICES = jax.jit(
            lambda m, params: losses_lib.forward_frame(m, params).vertices
        )
    return _REPLAY_VERTICES


def _prefetch_iter(iterable, depth: int = 2):
    """Run the source iterator on a background thread with a bounded queue.

    `run_optimize`'s loop blocks on device results (shard writes call
    np.asarray on the step output), so without this the NEXT batch's host
    load (pack read / decode+warp) serializes behind device compute. The
    thread keeps loading while the main thread waits on the device —
    host/device overlap for both loader backends. Exceptions propagate."""
    import queue as queue_mod
    import threading

    q: "queue_mod.Queue" = queue_mod.Queue(maxsize=max(1, depth))
    sentinel = object()
    err: list = []

    def worker():
        try:
            for item in iterable:
                q.put(item)
        except BaseException as e:  # propagate into the consumer
            err.append(e)
        finally:
            q.put(sentinel)

    threading.Thread(target=worker, daemon=True).start()
    while True:
        item = q.get()
        if item is sentinel:
            if err:
                raise err[0]
            return
        yield item


def run_optimize(
    cfg: PipelineConfig,
    model,
    j_reg_initial: np.ndarray,
    batches: Iterable[Dict[str, np.ndarray]],
    out_dir: str,
    spin_fn=None,
    logger=None,
    use_mesh: bool = True,
    resume: bool = True,
):
    """The `optimize_pose_refiner` equivalent (reference: scripts/optimize.py:88-337).

    Returns (final TrainState, JRegLstsqAccumulator, ShardManifest).
    """
    import jax
    import jax.numpy as jnp

    from jrr_tpu.ops import jreg as jreg_lib
    from jrr_tpu.parallel import data_parallel, mesh as mesh_lib
    from jrr_tpu.refine import trainer
    from jrr_tpu.utils import checkpoint as ckpt_lib
    from jrr_tpu.utils.logging import outer_metrics_record

    manifest = ckpt_lib.ShardManifest(os.path.join(out_dir, "refined"))
    state = trainer.init_train_state(
        jax.random.PRNGKey(cfg.seed), jnp.asarray(j_reg_initial), cfg
    )
    # Resume shared state from the newest checkpoint if present.
    ckpt_dir = os.path.join(out_dir, "ckpt")
    if resume and os.path.isdir(ckpt_dir):
        existing = sorted(os.listdir(ckpt_dir))
        if existing:
            state = ckpt_lib.restore_train_state(
                os.path.join(ckpt_dir, existing[-1]), state
            )

    if use_mesh:
        n_dev = cfg.mesh.num_devices or mesh_lib.feasible_device_count(
            cfg.data.batch_size
        )
        mesh = mesh_lib.make_mesh(n_dev)
        step_fn = data_parallel.make_sharded_outer_step(mesh, cfg)
        state = mesh_lib.replicate(mesh, state)
        model_dev = mesh_lib.replicate(mesh, model)
        put_batch = lambda tree: mesh_lib.shard_batch(mesh, tree)
    else:
        step_fn = jax.jit(
            lambda s, m, i, d: trainer.outer_step(s, m, i, d, cfg)
        )
        model_dev = model
        put_batch = lambda tree: tree

    acc = trainer.JRegLstsqAccumulator.zero(model.num_verts)
    accumulate = jax.jit(trainer.jreg_lstsq_accumulate)

    acc_path = os.path.join(out_dir, "jreg_acc_ckpt.npz")
    acc_upto = -1
    if resume and os.path.exists(acc_path):
        with np.load(acc_path) as f:
            acc = trainer.JRegLstsqAccumulator(
                gram=jnp.asarray(f["gram"]), rhs=jnp.asarray(f["rhs"]),
                count=jnp.asarray(f["count"]),
            )
            acc_upto = int(f["upto"])

    def _maybe_ckpt_acc(shard_id, acc):
        if shard_id % ACC_CKPT_EVERY == ACC_CKPT_EVERY - 1:
            # The (V, V) gram pull (~190 MB) and the npz write happen on the
            # writer thread, ordered AFTER this shard's manifest entry.
            _wq_put(("acc_ckpt", shard_id, acc))

    # JRR_PHASE_TIMING=1 decomposes each batch's wall time by inserting
    # block_until_ready barriers at phase boundaries (changes overlap, so it
    # is a diagnostic mode — the phase columns land in the metrics JSONL).
    phase_timing = os.environ.get("JRR_PHASE_TIMING") == "1"

    # Host→device staging rides the prefetch thread: `map` is lazy, so the
    # worker inside `_prefetch_iter` runs load AND prep/put for batch k+1
    # while the main thread waits on batch k's device results — the tunnel
    # transfer (tens of MB of mask/GT tensors on axon) overlaps compute
    # instead of serializing in front of each dispatch.
    def _prep(batch):
        init, data = _batch_to_device_inputs(batch, spin_fn, cfg)
        return batch, put_batch(init), put_batch(data)

    staged = _prefetch_iter(map(_prep, batches), cfg.data.prefetch)

    # Shard writes are asynchronous: the writer thread owns every
    # device→host pull of refined results (np.asarray on the step output
    # blocks on the step AND pays the tunnel read), so the main thread can
    # dispatch batch k+1 while shard k drains. Accumulator checkpoints ride
    # the SAME ordered queue — the acc snapshot taken at shard N must never
    # hit disk before shard N's manifest entry (resume would double-count
    # shard N into the restored accumulator).
    import queue as queue_mod
    import threading

    wq: "queue_mod.Queue" = queue_mod.Queue(maxsize=2)
    werr: list = []

    def _writer():
        while True:
            item = wq.get()
            if item is None:
                return
            try:
                kind, sid, payload = item
                if kind == "shard":
                    manifest.write_shard(
                        sid, {k: np.asarray(v) for k, v in payload.items()}
                    )
                elif kind == "jreg_snap":
                    snap_dir = os.path.join(out_dir, "jreg_snapshots")
                    os.makedirs(snap_dir, exist_ok=True)
                    np.savez(
                        os.path.join(snap_dir, f"snap_{sid:05d}.npz"),
                        j_regressor=jax.device_get(payload), shard=sid,
                    )
                else:  # "acc_ckpt"
                    host = jax.device_get(payload)
                    np.savez(
                        acc_path, gram=host.gram, rhs=host.rhs,
                        count=host.count, upto=sid,
                    )
            except BaseException as e:  # surface in the main thread
                werr.append(e)
                return

    writer_thread = threading.Thread(target=_writer, daemon=True)
    writer_thread.start()

    def _check_writer():
        if werr:
            raise RuntimeError("async shard writer failed") from werr[0]

    def _wq_put(item):
        # A dead writer stops draining; a bare put on the full queue would
        # deadlock. Poll the error list while waiting.
        while True:
            _check_writer()
            try:
                wq.put(item, timeout=5.0)
                return
            except queue_mod.Full:
                continue

    for shard_id, (batch, init, data) in enumerate(staged):
        _check_writer()
        if resume and shard_id <= acc_upto and manifest.is_done(shard_id):
            continue  # already folded into the checkpointed accumulator
        if resume and manifest.is_done(shard_id):
            # The lstsq accumulator is NOT checkpointed; rebuild this shard's
            # contribution from its saved refined params (deterministic SMPL
            # replay — identical statistics to the original pass). Without
            # this, a fully-resumed run fits the regressor on an EMPTY
            # accumulator and silently produces a zero (→ NaN after row
            # normalization) regressor.
            from jrr_tpu.refine import losses as losses_lib

            saved = manifest.read_shard(shard_id)
            # Shards pair with batches purely by position, so a resume under
            # a different shuffle/seed/batch-size would silently cross-pair
            # refined vertices with the wrong frames' GT. The shard stores
            # its gt_j3d; any mismatch — SHAPE first (np.allclose would raise
            # an opaque broadcast error, or broadcast-compare a size-1 batch),
            # then values — is a hard error.
            if "gt_j3d" not in saved:
                # Pre-identity-field manifests can't be pairing-validated; a
                # silent skip could cross-pair refined params with the wrong
                # frames' GT, so say so loudly (ADVICE r2).
                print(
                    f"WARNING: shard {shard_id} predates the gt_j3d identity "
                    "field — resume-time batch/shard pairing cannot be "
                    "validated; ensure the data order (seed/batch-size/split) "
                    "is unchanged, or clear the output dir."
                )
            if "gt_j3d" in saved and (
                saved["gt_j3d"].shape != np.asarray(batch["gt_j3d"]).shape
                or not np.allclose(saved["gt_j3d"], batch["gt_j3d"], atol=1e-5)
            ):
                raise ValueError(
                    f"shard {shard_id}: saved gt_j3d does not match this "
                    "run's batch — the data order changed since the manifest "
                    "was written (different seed/batch-size/split/epochs?). "
                    "Clear the output dir or restore the original config."
                )
            params = losses_lib.FrameParams(
                pose6d=jnp.asarray(saved["pose6d"]),
                orient6d=jnp.asarray(saved["orient6d"]),
                betas=jnp.asarray(saved["betas"]),
                cam_t=jnp.asarray(saved["cam_t"]),
            )
            acc = accumulate(
                acc,
                _replay_vertices()(model, params),
                jnp.asarray(batch["gt_j3d"]),
                jnp.asarray(saved["joints3d"][:, :1]),
            )
            _maybe_ckpt_acc(shard_id, acc)
            continue
        t0 = time.time()
        phases = {}
        if phase_timing:
            # Residual staging wait (the prefetch thread did load+prep+put).
            jax.block_until_ready((init, data))
            phases["prep"] = time.time() - t0
        t1 = time.time()
        state, m, result = step_fn(state, model_dev, init, data)
        if phase_timing:
            jax.block_until_ready((state, m, result))
            phases["step"] = time.time() - t1
        t1 = time.time()

        pelvis = result.joints3d[:, :1]
        acc = accumulate(acc, result.vertices, data.gt_j3d, pelvis)
        if phase_timing:
            jax.block_until_ready(acc)
            phases["acc"] = time.time() - t1
        t1 = time.time()

        _wq_put((
            "shard",
            shard_id,
            {
                "pose6d": result.params.pose6d,
                "orient6d": result.params.orient6d,
                "betas": result.params.betas,
                "cam_t": result.params.cam_t,
                "joints3d": result.joints3d,
                # Frame identity for resume-time pairing validation.
                "gt_j3d": np.asarray(batch["gt_j3d"]),
            },
        ))
        if phase_timing:
            phases["write_enqueue"] = time.time() - t1
        t1 = time.time()
        snap_every = cfg.jreg.snapshot_interval
        if snap_every and shard_id % snap_every == snap_every - 1:
            # Adam-path regressor convergence curve (JRegConfig.snapshot_interval):
            # the device pull + npz write happen on the writer thread.
            _wq_put(("jreg_snap", shard_id, state.j_reg_raw))
        _maybe_ckpt_acc(shard_id, acc)
        if logger is not None:
            if phase_timing:
                phases["ckpt"] = time.time() - t1
            t1 = time.time()
            # ONE transfer for the whole scalar pytree + step counter: on the
            # axon backend every host read is a tunnel round trip, and the
            # per-field float() path costs ~17 of them per batch.
            m_host, step_host = jax.device_get((m, state.step))
            rec = outer_metrics_record(m_host)
            if phase_timing:
                phases["log_pull"] = time.time() - t1
                rec.update({f"phase_{k}_s": round(v, 4) for k, v in phases.items()})
            rec["shard"] = shard_id
            rec["batch_seconds"] = time.time() - t0
            logger.log(rec, step=int(step_host))

    _wq_put(None)
    writer_thread.join()
    _check_writer()
    ckpt_lib.save_train_state(os.path.join(out_dir, "ckpt"), jax.device_get(state), int(jax.device_get(state.step)))
    return jax.device_get(state), jax.device_get(acc), manifest


# Module-level jitted SPIN apply: the variables tree rides as a jit ARGUMENT
# (axon rule — closure-captured device arrays are re-fetched through the
# tunnel at every lowering), and the jit cache is shared across calls.
_SPIN_APPLY = None


def make_spin_fn(checkpoint_path: str, mean_params_path: Optional[str] = None):
    """Published SPIN torch checkpoint → jitted initializer fn.

    The reference builds hmr + loads `model_checkpoint.pt` and runs it per
    batch to initialize refinement (reference: scripts/optimize.py:90-94,
    164-168). Accepts the SPIN repo layouts: `model_checkpoint.pt` or the
    `.pt.tar` variant — any torch file whose ['model'] (or root) is the hmr
    state_dict, with or without DataParallel `module.` prefixes (stripped in
    the converter); `mean_params_path` is SPIN's smpl_mean_params.npz
    (init_pose/shape/cam buffers). A drifted key layout raises
    `CheckpointLayoutError` with a diff report.
    """
    global _SPIN_APPLY
    import jax

    from jrr_tpu.models import spin as spin_lib

    if checkpoint_path.endswith((".npz", ".npy")):
        # Already-converted flax variables (np.savez of the flattened tree is
        # not supported — use the torch layout or a pickled tree).
        raise ValueError("pass the torch SPIN checkpoint (.pt); conversion is built in")
    import torch

    ckpt = torch.load(checkpoint_path, map_location="cpu", weights_only=False)
    sd = ckpt.get("model", ckpt) if isinstance(ckpt, dict) else ckpt
    sd = {k: np.asarray(v.detach() if hasattr(v, "detach") else v) for k, v in sd.items()}
    mean = None
    if mean_params_path:
        with np.load(mean_params_path) as f:
            mean = {k: f[k] for k in f.files}
    variables = spin_lib.convert_torch_spin_checkpoint(sd, mean)

    if _SPIN_APPLY is None:
        model = spin_lib.SPIN()
        _SPIN_APPLY = jax.jit(lambda v, img: model.apply(v, img, train=False))
    return lambda img: _SPIN_APPLY(variables, img)


def load_regressor_file(path: str) -> np.ndarray:
    """(17, V) regressor from .npy / .npz(j_regressor) / torch .pt."""
    if path.endswith(".npy"):
        return np.load(path).astype(np.float32)
    if path.endswith(".npz"):
        with np.load(path) as f:
            key = "j_regressor" if "j_regressor" in f else f.files[0]
            return f[key].astype(np.float32)
    import torch

    return torch.load(path, map_location="cpu", weights_only=False).numpy().astype(np.float32)


def run_pipeline(
    cfg: PipelineConfig,
    data_root: Optional[str] = None,
    out_dir: str = "output",
    demo: bool = False,
    logger=None,
    jreg_init_path: Optional[str] = None,
    spin_checkpoint: Optional[str] = None,
    spin_mean_params: Optional[str] = None,
    loader: str = "auto",
    vibe_checkpoint: Optional[str] = None,
    meva_checkpoint: Optional[str] = None,
    consumer_seqlen: int = 16,
    model=None,
    demo_frames: Optional[int] = None,
) -> PipelineArtifacts:
    """Full flow: [SPIN init →] optimize → regressor fit → protocol-2 eval
    [→ VIBE/MEVA consumer evals].

    `loader` selects the host input pipeline: "python" = H36MDataset +
    prefetching BatchLoader; "native" = the C++ pack pipeline (builds
    frames.jrrpack on first use); "auto" = native when a pack already exists.
    `spin_checkpoint` enables live per-batch SPIN initialization (reference:
    scripts/optimize.py:164-182) instead of the precomputed orient/pose
    tensors. `vibe_checkpoint` / `meva_checkpoint` run the consumer-path
    before/after evals after retraining (reference: main.py:26-27 →
    scripts/test.py:141-301), including the TRUE sequence eval whenever the
    dataset carries temporal order (`H36MDataset.frame_order`).
    """
    import jax.numpy as jnp

    from jrr_tpu.data import fixtures, h36m
    from jrr_tpu.evals import harness
    from jrr_tpu.models import smpl as smpl_lib
    from jrr_tpu.refine import trainer

    os.makedirs(out_dir, exist_ok=True)

    if demo:
        # `model` override lets programmatic callers (tools/pipeline_bench.py)
        # run the demo flow at FULL size (6890-vert synthetic body) while the
        # CLI default stays demo-small; `demo_frames` sizes the fixture set.
        if model is None:
            model = smpl_lib.synthetic_smpl_model(
                seed=cfg.seed, num_verts=256, num_faces=500
            )
        rng = np.random.default_rng(cfg.seed)
        j_reg_initial = np.zeros((17, model.num_verts), np.float32)
        for j in range(17):
            j_reg_initial[j, rng.choice(model.num_verts, 6, replace=False)] = rng.uniform(
                0.5, 1.0, 6
            )
        data_root = data_root or os.path.join(out_dir, "fixtures")
        if not os.path.exists(os.path.join(data_root, "precomputed_val")):
            fixtures.write_fixture_dataset(
                data_root, num_frames=demo_frames or cfg.data.batch_size * 2,
                seed=cfg.seed, model=model, j_reg_raw=j_reg_initial,
            )
        # Train from a perturbed regressor so the before/after comparison has
        # real error to recover (the true regressor generated the fixtures).
        j_reg_initial = j_reg_initial + np.abs(
            rng.normal(scale=0.15, size=j_reg_initial.shape)
        ).astype(np.float32) * (j_reg_initial == 0) * (
            rng.uniform(size=j_reg_initial.shape) < 0.05
        ) + rng.normal(scale=0.08, size=j_reg_initial.shape).astype(np.float32) * (
            j_reg_initial > 0
        )
    else:
        # The reference starts training from SPIN's ORIGINAL
        # J_regressor_h36m.npy (scripts/optimize.py:105-107). Defaulting to
        # the shipped *retrained* artifact would silently corrupt any
        # before/after comparison, so outside --demo an init is mandatory:
        # either an explicit --jreg-init path or a converted
        # J_regressor_h36m.{npy,npz} resolved from the data root.
        if jreg_init_path is None:
            for cand in (
                os.path.join(data_root or "", "J_regressor_h36m.npy"),
                os.path.join(data_root or "", "J_regressor_h36m.npz"),
            ):
                if data_root and os.path.exists(cand):
                    jreg_init_path = cand
                    break
        if jreg_init_path is None:
            raise ValueError(
                "no --jreg-init given and no J_regressor_h36m.{npy,npz} found "
                "under the data root; training must start from the original "
                "regressor (reference: scripts/optimize.py:105-107), not the "
                "shipped retrained artifact"
            )
        j_reg_initial = load_regressor_file(jreg_init_path)
        if model is None:
            model = smpl_lib.resolve_smpl_model()

    spin_fn = None
    if spin_checkpoint is not None:
        spin_fn = make_spin_fn(spin_checkpoint, spin_mean_params)

    # Host input pipeline: the C++ pack loader feeds batches with zero Python
    # in the per-frame loop (decode + two warps in the runtime thread pool);
    # the Python loader is the fallback (and the packer's source).
    sub = "precomputed_train" if cfg.data.split == "train" else "precomputed_val"
    pack_path = os.path.join(data_root or "", sub, "frames.jrrpack")
    use_native = loader == "native" or (loader == "auto" and os.path.exists(pack_path))
    if use_native:
        from jrr_tpu.data import native_pipeline

        packed = native_pipeline.PackedH36MDataset(data_root, cfg.data.split)
        index_source = packed  # frame_order() + load_batch(indices)

        def epoch_batches(for_eval: bool = False):
            for epoch in range(1 if for_eval else max(1, cfg.data.train_epochs)):
                yield from packed.batches(
                    cfg.data.batch_size, seed=cfg.data.shuffle_seed,
                    epoch=epoch, drop_last=True,
                )
    else:
        dataset = h36m.H36MDataset(data_root, cfg.data.split)
        index_source = dataset
        batch_loader = h36m.BatchLoader(
            dataset, cfg.data.batch_size, seed=cfg.data.shuffle_seed,
            drop_last=True, prefetch=cfg.data.prefetch,
        )

        def epoch_batches(for_eval: bool = False):
            """All train epochs back to back, reshuffled per epoch
            (reference: --train_epochs, scripts/args.py:7)."""
            for epoch in range(1 if for_eval else max(1, cfg.data.train_epochs)):
                batch_loader.set_epoch(epoch)
                yield from iter(batch_loader)

    state, acc, manifest = run_optimize(
        cfg, model, j_reg_initial, epoch_batches(), out_dir, logger=logger,
        use_mesh=True, spin_fn=spin_fn,
    )
    j_reg_final = np.asarray(state.j_reg_raw)
    j_reg_lstsq = np.asarray(trainer.jreg_lstsq_solve(acc, cfg.jreg.lstsq_ridge))
    np.savez(
        os.path.join(out_dir, "retrained_j_regressor.npz"),
        j_regressor=j_reg_final, j_regressor_lstsq=j_reg_lstsq,
    )

    # Protocol-2 eval: initializer predictions through initial vs final
    # regressor. With a live SPIN model the predictions come from the network
    # on the 224 crop (reference: scripts/test.py:97-105); otherwise from the
    # stored precomputed SPIN outputs.
    def predictions():
        from jrr_tpu.models import spin as spin_lib

        for batch in epoch_batches(for_eval=True):
            if spin_fn is not None:
                pose6d, betas, _ = spin_fn(
                    spin_lib.normalize_image(jnp.asarray(batch["spin_image"]))
                )
                pose6d, betas = np.asarray(pose6d), np.asarray(betas)
            else:
                pose6d = np.concatenate(
                    [batch["orient"].reshape(-1, 1, 6), batch["pose"]], axis=1
                )
                betas = batch["betas"]
            yield {"pose6d": pose6d, "betas": betas, "gt_j3d": batch["gt_j3d"]}

    # ONE pass over the eval split scores all three regressors (initial /
    # Adam-path final / lstsq fit) on the same per-batch SMPL vertices —
    # the initializer (and live SPIN network, when given) runs once, not
    # once per regressor (harness.evaluate_regressors).
    res_init, res_final, res_lstsq = harness.evaluate_regressors(
        model, predictions(), [j_reg_initial, j_reg_final, j_reg_lstsq]
    )
    before_after = harness.BeforeAfter(before=res_init, after=res_final)
    print(before_after.summary())

    print(
        f"\nafter (lstsq fit)\nMPJPE\n{res_lstsq.mpjpe:.4f}\n"
        f"PAMPJPE\n{res_lstsq.pa_mpjpe:.4f}"
    )

    # Consumer-path evals (reference: main.py:26-27 → scripts/test.py:141-301):
    # the retrained regressor plugged into VIBE/MEVA video models.
    consumer_evals: Dict[str, object] = {}
    for kind, ckpt_path in (("vibe", vibe_checkpoint), ("meva", meva_checkpoint)):
        if ckpt_path is None:
            continue
        from jrr_tpu.evals import consumers as consumers_lib
        from jrr_tpu.models import spin as spin_lib

        consumer, seq_consumer, meta = consumers_lib.build_consumer(
            kind, ckpt_path, model, spin_checkpoint=spin_checkpoint,
            spin_mean_params=spin_mean_params, seqlen=consumer_seqlen,
        )
        print(f"\n[{kind.upper()}] checkpoint layout: {meta}")

        def norm_batch(batch):
            b = dict(batch)
            b["spin_image"] = np.asarray(
                spin_lib.normalize_image(jnp.asarray(batch["spin_image"]))
            )
            return b

        pair = harness.evaluate_consumer(
            consumer,
            (norm_batch(b) for b in epoch_batches(for_eval=True)),
            jnp.asarray(j_reg_initial), jnp.asarray(j_reg_final),
        )
        print(f"\n{kind.upper()}\n{pair.summary()}")
        consumer_evals[kind] = pair

        order = index_source.frame_order()
        if order is not None:
            seq_batches = h36m.ordered_sequence_batches(
                lambda idx: norm_batch(index_source.load_batch(idx)),
                order, cfg.data.batch_size, consumer_seqlen,
            )
            seq_pair = harness.evaluate_consumer_sequences(
                seq_consumer, seq_batches,
                jnp.asarray(j_reg_initial), jnp.asarray(j_reg_final),
                seqlen=consumer_seqlen,
            )
            print(f"\n{kind.upper()} (sequence)\n{seq_pair.summary()}")
            consumer_evals[f"{kind} (sequence)"] = seq_pair
        else:
            print(
                f"{kind.upper()}: no temporal order available in the dataset "
                "(no seq_id/frame_id tensors and no image paths) — sequence "
                "eval skipped; frame-level consumer eval above is complete."
            )

    return PipelineArtifacts(
        j_reg_initial=j_reg_initial,
        j_reg_final=j_reg_final,
        j_reg_lstsq=j_reg_lstsq,
        eval_before_after=before_after,
        out_dir=out_dir,
        consumer_evals=consumer_evals,
    )
