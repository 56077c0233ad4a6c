"""Temporal (VIBE-style) consumer model."""

import numpy as np
import jax
import jax.numpy as jnp

from jrr_tpu.models import smpl as smpl_mod, temporal
from jrr_tpu.ops import jreg as jreg_lib
from jrr_tpu.evals import harness


def test_temporal_shapes_and_consumer():
    model, variables = temporal.init_temporal(jax.random.PRNGKey(0), seqlen=2, image_size=64)
    video = jnp.zeros((1, 2, 3, 64, 64))
    pose, betas, cam = model.apply(variables, video, train=False)
    assert pose.shape == (1, 2, 24, 6)
    assert betas.shape == (1, 2, 10)
    assert cam.shape == (1, 2, 3)

    smpl_model = smpl_mod.synthetic_smpl_model(seed=0, num_verts=96, num_faces=120)
    rng = np.random.default_rng(0)
    j = np.zeros((17, 96), np.float32)
    for k in range(17):
        j[k, rng.choice(96, 6, replace=False)] = 1.0
    j_norm = jreg_lib.normalize_jreg(jnp.asarray(j))

    consumer = temporal.make_temporal_consumer(smpl_model, model, variables, seqlen=2)
    kp3d = consumer(jnp.zeros((2, 3, 64, 64)), j_norm)
    assert kp3d.shape == (2, 17, 3)
    assert np.isfinite(np.asarray(kp3d)).all()

    # Through the before/after harness.
    batches = [{
        "spin_image": np.zeros((2, 3, 64, 64), np.float32),
        "gt_j3d": np.asarray(kp3d) * 1000.0,
    }]
    res = harness.evaluate_consumer(consumer, batches, jnp.asarray(j), jnp.asarray(j))
    assert res.after.mpjpe < 1e-3  # self-consistent by construction


def _fabricate_vibe_state_dict(torch, gru, linear, head, feat_dim):
    """Assemble a `gen_state_dict` with the published VIBE key naming from
    live torch modules (reference loads this layout at scripts/test.py:161-166)."""
    sd = {}
    for k, v in gru.state_dict().items():
        sd[f"encoder.gru.{k}"] = v.detach().numpy()
    sd["encoder.linear.weight"] = linear.weight.detach().numpy()
    sd["encoder.linear.bias"] = linear.bias.detach().numpy()
    for name, mod in head.items():
        sd[f"regressor.{name}.weight"] = mod.weight.detach().numpy()
        sd[f"regressor.{name}.bias"] = mod.bias.detach().numpy()
    rng = np.random.default_rng(5)
    sd["regressor.init_pose"] = rng.normal(scale=0.1, size=(1, 144)).astype(np.float32)
    sd["regressor.init_shape"] = np.zeros((1, 10), np.float32)
    sd["regressor.init_cam"] = np.asarray([[0.9, 0.0, 0.0]], np.float32)
    return sd


def _torch_head_modules(torch, feat_dim=2048):
    torch.manual_seed(3)
    return {
        "fc1": torch.nn.Linear(feat_dim + 144 + 10 + 3, 1024),
        "fc2": torch.nn.Linear(1024, 1024),
        "decpose": torch.nn.Linear(1024, 144),
        "decshape": torch.nn.Linear(1024, 10),
        "deccam": torch.nn.Linear(1024, 3),
    }


def test_vibe_checkpoint_converter_parity():
    """Converted VIBE gen_state_dict == torch nn.GRU + linear + residual +
    IEF head, the published VIBE_Demo config (2-layer, hidden H, add_linear,
    use_residual; reference: scripts/test.py:153-159) at feature level."""
    import pytest
    torch = pytest.importorskip("torch")
    from jrr_tpu.models import spin as spin_lib

    torch.manual_seed(11)
    H, D, B, T = 32, 2048, 2, 5
    gru = torch.nn.GRU(D, H, num_layers=2, batch_first=True)
    linear = torch.nn.Linear(H, D)
    head = _torch_head_modules(torch, D)
    sd = _fabricate_vibe_state_dict(torch, gru, linear, head, D)

    variables = temporal.convert_torch_vibe_checkpoint(sd, hidden_size=H, n_layers=2)

    x = np.random.default_rng(2).normal(size=(B, T, D)).astype(np.float32)
    with torch.no_grad():
        y, _ = gru(torch.from_numpy(x))
        # VIBE TemporalEncoder.forward: ReLU on the GRU output, then the
        # linear, then the residual (mkocabas/VIBE lib/models/vibe.py).
        y = linear(torch.relu(y)) + torch.from_numpy(x)
        flat = y.reshape(B * T, D)
        pose = torch.from_numpy(np.repeat(sd["regressor.init_pose"], B * T, 0))
        shape = torch.from_numpy(np.repeat(sd["regressor.init_shape"], B * T, 0))
        cam = torch.from_numpy(np.repeat(sd["regressor.init_cam"], B * T, 0))
        for _ in range(3):
            xc = torch.cat([flat, pose, shape, cam], dim=1)
            xc = torch.relu(head["fc1"](xc))
            xc = torch.relu(head["fc2"](xc))
            pose = head["decpose"](xc) + pose
            shape = head["decshape"](xc) + shape
            cam = head["deccam"](xc) + cam

    enc = temporal.TemporalEncoder(hidden_size=H, n_layers=2, out_size=D)
    y_flax = enc.apply({"params": variables["params"]["encoder"]}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(y_flax), y.numpy(), atol=2e-5)

    p = variables["params"]
    reg = spin_lib.SPINRegressor(n_iter=3)
    flat_j = jnp.asarray(y.numpy().reshape(B * T, D))
    pose_f, shape_f, cam_f = reg.apply(
        {"params": p["head"]}, flat_j,
        jnp.repeat(p["init_pose"], B * T, 0),
        jnp.repeat(p["init_shape"], B * T, 0),
        jnp.repeat(p["init_cam"], B * T, 0),
    )
    np.testing.assert_allclose(np.asarray(pose_f), pose.numpy(), atol=2e-4)
    np.testing.assert_allclose(np.asarray(shape_f), shape.numpy(), atol=2e-4)
    np.testing.assert_allclose(np.asarray(cam_f), cam.numpy(), atol=2e-4)


def test_vibe_converter_bidirectional_parity():
    """The MEVA-side option: bidirectional stacked GRU (reference:
    scripts/test.py:180-189 passes cfg.MODEL.TGRU.BIDIRECTIONAL)."""
    import pytest
    torch = pytest.importorskip("torch")

    torch.manual_seed(13)
    H, D, B, T = 16, 24, 2, 7
    gru = torch.nn.GRU(D, H, num_layers=2, batch_first=True, bidirectional=True)
    linear = torch.nn.Linear(2 * H, D)
    head = _torch_head_modules(torch, D)
    sd = _fabricate_vibe_state_dict(torch, gru, linear, head, D)

    variables = temporal.convert_torch_vibe_checkpoint(
        sd, hidden_size=H, n_layers=2, bidirectional=True
    )
    x = np.random.default_rng(4).normal(size=(B, T, D)).astype(np.float32)
    with torch.no_grad():
        y, _ = gru(torch.from_numpy(x))
        y = linear(torch.relu(y)) + torch.from_numpy(x)

    enc = temporal.TemporalEncoder(hidden_size=H, n_layers=2, bidirectional=True, out_size=D)
    y_flax = enc.apply({"params": variables["params"]["encoder"]}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(y_flax), y.numpy(), atol=2e-5)


def test_converted_variables_drive_full_model():
    """The converter's tree must match TemporalPoseModel's expected params
    exactly (incl. the spliced SPIN backbone), end-to-end through the
    consumer adapter + before/after harness."""
    import pytest
    torch = pytest.importorskip("torch")
    from jrr_tpu.models import spin as spin_lib

    torch.manual_seed(17)
    H, D = 32, 2048
    gru = torch.nn.GRU(D, H, num_layers=2, batch_first=True)
    linear = torch.nn.Linear(H, D)
    head = _torch_head_modules(torch, D)
    sd = _fabricate_vibe_state_dict(torch, gru, linear, head, D)

    # Backbone comes from a separate SPIN checkpoint in the reference
    # (VIBE_Demo loads it itself); here: a randomly-initialized flax SPIN.
    _, spin_vars = spin_lib.init_spin(jax.random.PRNGKey(0))
    variables = temporal.convert_torch_vibe_checkpoint(
        sd, backbone_variables=spin_vars, hidden_size=H, n_layers=2
    )

    model = temporal.TemporalPoseModel(hidden_size=H, n_layers=2)
    pose, betas, cam = model.apply(variables, jnp.zeros((1, 2, 3, 64, 64)), train=False)
    assert pose.shape == (1, 2, 24, 6) and betas.shape == (1, 2, 10)

    smpl_model = smpl_mod.synthetic_smpl_model(seed=0, num_verts=96, num_faces=120)
    j = np.eye(17, 96, dtype=np.float32)
    consumer = temporal.make_temporal_consumer(smpl_model, model, variables, seqlen=2)
    kp3d = consumer(jnp.zeros((2, 3, 64, 64)), jreg_lib.normalize_jreg(jnp.asarray(j)))
    assert kp3d.shape == (2, 17, 3) and np.isfinite(np.asarray(kp3d)).all()


def test_sequence_consumer_real_temporal_context():
    """TRUE video-sequence eval (reference: scripts/test.py:254-273): a
    bidirectional GRU consumer on REAL sequences produces different frame-0
    joints than single-frame tiled eval (future frames flow into frame 0
    through the backward GRU), while on a constant sequence both modes agree
    exactly — the adapters compute the same math."""
    model = temporal.TemporalPoseModel(hidden_size=16, n_layers=1, bidirectional=True)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 4, 3, 64, 64))
    )
    smpl_model = smpl_mod.synthetic_smpl_model(seed=0, num_verts=96, num_faces=120)
    j = np.eye(17, 96, dtype=np.float32)
    j_norm = jreg_lib.normalize_jreg(jnp.asarray(j))

    rng = np.random.default_rng(0)
    video = jnp.asarray(rng.normal(size=(1, 4, 3, 64, 64)).astype(np.float32))

    seq_consumer = temporal.make_sequence_consumer(smpl_model, model, variables)
    tiled_consumer = temporal.make_temporal_consumer(smpl_model, model, variables, seqlen=4)

    kp_seq = seq_consumer(video, j_norm)  # (1, 4, 17, 3)
    assert kp_seq.shape == (1, 4, 17, 3)
    kp_tiled = tiled_consumer(video[:, 0], j_norm)  # (1, 17, 3)

    # Real temporal context changes the frame-0 prediction.
    assert float(jnp.abs(kp_seq[:, 0] - kp_tiled).max()) > 1e-5

    # Constant sequence: both modes are the same computation.
    const_video = jnp.repeat(video[:, :1], 4, axis=1)
    kp_const = seq_consumer(const_video, j_norm)
    np.testing.assert_allclose(
        np.asarray(kp_const[:, 0]), np.asarray(kp_tiled), atol=1e-5
    )


def test_evaluate_consumer_sequences_harness():
    """Chunking + frame selection semantics of the sequence-mode harness:
    self-consistent GT gives ~zero after-error; leftover frames are dropped
    like the reference's seqlen chunking."""
    model = temporal.TemporalPoseModel(hidden_size=16, n_layers=1, bidirectional=True)
    variables = model.init(jax.random.PRNGKey(1), jnp.zeros((1, 2, 3, 64, 64)))
    smpl_model = smpl_mod.synthetic_smpl_model(seed=0, num_verts=96, num_faces=120)
    j = np.eye(17, 96, dtype=np.float32)
    j_norm = jreg_lib.normalize_jreg(jnp.asarray(j))

    rng = np.random.default_rng(1)
    frames = rng.normal(size=(5, 3, 64, 64)).astype(np.float32)  # 2 chunks of 2 + 1 dropped
    seq_consumer = temporal.make_sequence_consumer(smpl_model, model, variables)

    video = jnp.asarray(frames[:4].reshape(2, 2, 3, 64, 64))
    kp = seq_consumer(video, j_norm)  # (2, 2, 17, 3)
    gt = np.zeros((5, 17, 3), np.float32)
    gt[0] = np.asarray(kp[0, 0]) * 1000.0
    gt[2] = np.asarray(kp[1, 0]) * 1000.0

    res = harness.evaluate_consumer_sequences(
        seq_consumer,
        [{"spin_image": frames, "gt_j3d": gt}],
        jnp.asarray(j), jnp.asarray(j), seqlen=2, frame_index=0,
    )
    assert res.after.num_frames == 2  # 2 chunks scored, 5th frame dropped
    assert res.after.mpjpe < 1e-3
