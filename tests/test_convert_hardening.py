"""Converter hardening against real-artifact layout drift (VERDICT r3 item 8).

The published SPIN/VIBE/MEVA checkpoints are data-gated here; these tests
pin the two failure modes the converters must absorb the day the real files
appear: DataParallel `module.` prefixes load transparently, and a drifted key
layout produces an actionable diff report instead of a bare KeyError."""

import numpy as np
import pytest

import jax

from jrr_tpu.models import convert_util, meva, temporal

torch = pytest.importorskip("torch")

from tests.test_temporal import _fabricate_vibe_state_dict, _torch_head_modules


def _small_vibe_sd(H=8, D=16):
    torch.manual_seed(0)
    gru = torch.nn.GRU(D, H, num_layers=2, batch_first=True)
    linear = torch.nn.Linear(H, D)
    head = {
        "fc1": torch.nn.Linear(D + 144 + 10 + 3, 12),
        "fc2": torch.nn.Linear(12, 12),
        "decpose": torch.nn.Linear(12, 144),
        "decshape": torch.nn.Linear(12, 10),
        "deccam": torch.nn.Linear(12, 3),
    }
    return _fabricate_vibe_state_dict(torch, gru, linear, head, D), H


def test_vibe_module_prefix_accepted():
    sd, H = _small_vibe_sd()
    plain = temporal.convert_torch_vibe_checkpoint(sd, hidden_size=H, n_layers=2)
    prefixed = temporal.convert_torch_vibe_checkpoint(
        {f"module.{k}": v for k, v in sd.items()}, hidden_size=H, n_layers=2
    )
    for a, b in zip(jax.tree.leaves(plain), jax.tree.leaves(prefixed)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_vibe_mangled_key_gets_diff_report():
    sd, H = _small_vibe_sd()
    # Simulate a drifted layout: the GRU module renamed upstream.
    mangled = {
        k.replace("encoder.gru.", "encoder.temporal_gru."): v for k, v in sd.items()
    }
    with pytest.raises(convert_util.CheckpointLayoutError) as ei:
        temporal.convert_torch_vibe_checkpoint(mangled, hidden_size=H, n_layers=2)
    msg = str(ei.value)
    assert "encoder.gru.weight_ih_l0" in msg  # the key the converter wanted
    assert "closest keys present" in msg
    assert "encoder.temporal_gru.weight_ih_l0" in msg  # what the file has
    assert "24x16" in msg  # shapes included ((3H, D) = (24, 16))
    assert "key groups present" in msg


def test_meva_mangled_vae_key_gets_diff_report():
    sd, H = _small_vibe_sd()
    # A VIBE-shaped dict has no vae_model.* keys at all — the MEVA converter
    # must say so usefully (e.g. someone passes a VIBE file as --meva-checkpoint).
    with pytest.raises(convert_util.CheckpointLayoutError) as ei:
        meva.convert_torch_meva_checkpoint(sd, hidden_size=H, n_layers=2, vae_hidden=H)
    msg = str(ei.value)
    assert "vae_model.enc_gru.weight_ih_l0" in msg
    assert "key groups present" in msg
    assert "encoder.* " in msg  # inventory shows what IS there


def test_spin_empty_state_dict_reports_inventory():
    from jrr_tpu.models import spin as spin_lib

    with pytest.raises(convert_util.CheckpointLayoutError) as ei:
        spin_lib.convert_torch_spin_checkpoint({"unrelated.weight": np.zeros((2, 2))})
    msg = str(ei.value)
    assert "conv1.weight" in msg
    assert "1 tensors present" in msg


def test_statedictview_strips_module_prefix_and_reads_torch_tensors():
    view = convert_util.StateDictView(
        {"module.a.weight": torch.ones(2, 3), "b": np.zeros(4)}, "test"
    )
    assert "a.weight" in view and "b" in view
    assert view["a.weight"].shape == (2, 3)
    assert isinstance(view["a.weight"], np.ndarray)
    assert view.get("missing") is None
