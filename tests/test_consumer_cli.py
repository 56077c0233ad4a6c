"""Consumer evals reachable from the product flow (VERDICT r3 items 1/3/5).

The reference's `main.py:26-27` runs the VIBE and MEVA consumer evals as part
of the main pipeline; these tests drive the same flow through `jrr_tpu.cli`
with fabricated demo-scale checkpoints, plus unit coverage of the layout
sniffer and the temporally-ordered sequence iterator."""

import numpy as np
import pytest

from jrr_tpu.data import h36m


def _fabricate_vibe_gen_sd(torch, H=8, D=2048, head_width=1024):
    # head_width must be the real 1024: flax validates stored param shapes
    # against the module definition at apply time (SPINRegressor hardcodes
    # fc1/fc2 = 1024, models/spin.py:95-96). The GRU stays demo-small — its
    # width is sniffed from the checkpoint.
    torch.manual_seed(0)
    gru = torch.nn.GRU(D, H, num_layers=2, batch_first=True)
    linear = torch.nn.Linear(H, D)
    sd = {}
    for k, v in gru.state_dict().items():
        sd[f"encoder.gru.{k}"] = v.detach().numpy()
    sd["encoder.linear.weight"] = linear.weight.detach().numpy()
    sd["encoder.linear.bias"] = linear.bias.detach().numpy()
    head = {
        "fc1": torch.nn.Linear(D + 144 + 10 + 3, head_width),
        "fc2": torch.nn.Linear(head_width, head_width),
        "decpose": torch.nn.Linear(head_width, 144),
        "decshape": torch.nn.Linear(head_width, 10),
        "deccam": torch.nn.Linear(head_width, 3),
    }
    for name, mod in head.items():
        sd[f"regressor.{name}.weight"] = mod.weight.detach().numpy() * 0.01
        sd[f"regressor.{name}.bias"] = mod.bias.detach().numpy() * 0.01
    sd["regressor.init_pose"] = np.zeros((1, 144), np.float32)
    sd["regressor.init_shape"] = np.zeros((1, 10), np.float32)
    sd["regressor.init_cam"] = np.asarray([[0.9, 0.0, 0.0]], np.float32)
    return sd


def _fabricate_meva_gen_sd(torch, H=8, D=2048, latent=8, head_width=1024):
    sd = _fabricate_vibe_gen_sd(torch, H=H, D=D, head_width=head_width)
    del sd["regressor.init_pose"]  # MEVA's init pose comes from the VAE decode
    vae_gru_e = torch.nn.GRU(D, H, num_layers=1, batch_first=True)
    vae_gru_d = torch.nn.GRU(latent, H, num_layers=1, batch_first=True)
    for k, v in vae_gru_e.state_dict().items():
        sd[f"vae_model.enc_gru.{k}"] = v.detach().numpy()
    for k, v in vae_gru_d.state_dict().items():
        sd[f"vae_model.d_gru.{k}"] = v.detach().numpy()
    for name, lin in (
        ("e_mu", torch.nn.Linear(H, latent)),
        ("e_logvar", torch.nn.Linear(H, latent)),
        ("d_init", torch.nn.Linear(latent, H)),
        ("d_out", torch.nn.Linear(H, 144)),
        ("feat_to_latent", torch.nn.Linear(D, latent)),
    ):
        prefix = name if name == "feat_to_latent" else f"vae_model.{name}"
        sd[f"{prefix}.weight"] = lin.weight.detach().numpy() * 0.01
        sd[f"{prefix}.bias"] = lin.bias.detach().numpy() * 0.01
    return sd


def test_sniff_temporal_layout():
    torch = pytest.importorskip("torch")
    from jrr_tpu.evals import consumers

    sd = _fabricate_vibe_gen_sd(torch, H=8)
    meta = consumers.sniff_temporal_layout(sd)
    assert meta == {"hidden_size": 8, "n_layers": 2, "bidirectional": False}

    sd_m = _fabricate_meva_gen_sd(torch, H=8, latent=6)
    meta_m = consumers.sniff_temporal_layout(sd_m)
    assert meta_m["latent_dim"] == 6 and meta_m["vae_hidden"] == 8


def test_build_meva_consumer_from_file(tmp_path):
    """build_consumer loads a torch file, sniffs the layout, converts, and
    splices a (random, loudly-warned) backbone; the converted tree drives
    MEVAPoseModel.apply-compatible params."""
    torch = pytest.importorskip("torch")
    from jrr_tpu.evals import consumers
    from jrr_tpu.models import smpl as smpl_lib

    sd = _fabricate_meva_gen_sd(torch)
    path = str(tmp_path / "meva.pth.tar")
    torch.save({"gen_state_dict": sd, "epoch": 1}, path)

    model = smpl_lib.synthetic_smpl_model(seed=0, num_verts=64, num_faces=100)
    consumer, seq_consumer, meta = consumers.build_consumer(
        "meva", path, model, seqlen=2
    )
    assert meta["n_layers"] == 2 and meta["latent_dim"] == 8
    assert callable(consumer) and callable(seq_consumer)


def test_frame_order_and_ordered_batches(tmp_path):
    """frame_order from explicit tensors and from image paths; the ordered
    iterator yields whole chunks that never cross sequence boundaries."""
    from jrr_tpu.data import fixtures

    root = str(tmp_path / "fix")
    fixtures.write_fixture_dataset(root, num_frames=10, num_sequences=2, seed=0)
    ds = h36m.H36MDataset(root, "validation")

    seq_ids, frame_nos = ds.frame_order()
    assert len(np.unique(seq_ids)) == 2
    # explicit tensors take priority and match the path-derived order
    del ds.tensors["seq_id"], ds.tensors["frame_id"]
    seq_ids2, frame_nos2 = ds.frame_order()
    np.testing.assert_array_equal(seq_ids, seq_ids2)
    np.testing.assert_array_equal(frame_nos, frame_nos2)

    chunks = h36m.sequence_chunk_indices(seq_ids, frame_nos, seqlen=2)
    assert chunks.shape == (4, 2)  # 5 frames/seq → 2 chunks each, remainder dropped
    for row in chunks:
        assert seq_ids[row[0]] == seq_ids[row[1]]  # no boundary crossing
        assert frame_nos[row[1]] == frame_nos[row[0]] + 1  # consecutive

    # A shuffled dataset view still comes back in order.
    calls = []

    def load_fn(idx):
        calls.append(np.asarray(idx))
        return {"i": np.asarray(idx)}

    batches = list(
        h36m.ordered_sequence_batches(load_fn, (seq_ids, frame_nos), 4, 2)
    )
    assert all(len(b["i"]) % 2 == 0 for b in batches)
    total = np.concatenate([b["i"] for b in batches])
    assert len(total) == 8  # 2 chunks per 5-frame sequence, remainders dropped


def test_sequence_chunk_indices_drops_remainders():
    seq_ids = np.asarray([0, 0, 0, 1, 1])
    frame_nos = np.asarray([2, 0, 1, 5, 6])
    chunks = h36m.sequence_chunk_indices(seq_ids, frame_nos, seqlen=2)
    # seq 0 has 3 frames → one chunk of its first two BY FRAME NUMBER (idx 1,2)
    np.testing.assert_array_equal(chunks, [[1, 2], [3, 4]])


@pytest.mark.slow
def test_cli_vibe_consumer_end_to_end(tmp_path, capsys):
    """ONE CLI invocation reproduces the reference's main.py flow including a
    consumer family: optimize → retrain → protocol-2 eval → VIBE consumer
    eval (frame-level AND true-sequence, through the ordered iterator)."""
    torch = pytest.importorskip("torch")
    from jrr_tpu import cli

    sd = _fabricate_vibe_gen_sd(torch)
    vibe_path = str(tmp_path / "vibe_model_wo_3dpw.pth.tar")
    torch.save({"gen_state_dict": sd, "performance": 56.5}, vibe_path)

    out = str(tmp_path / "out")
    cli.main([
        "--demo", "--out", out,
        "--stage-a-steps", "10", "--stage-b-steps", "2",
        "--batch-size", "4",
        "--vibe-checkpoint", vibe_path,
        "--consumer-seqlen", "2",
    ])
    stdout = capsys.readouterr().out
    assert "VIBE\nMPJPE" in stdout
    assert "VIBE (sequence)\nMPJPE" in stdout
    assert "RANDOM-initialized" in stdout  # no SPIN checkpoint → loud warning
