"""Published-checkpoint → RegressorConsumer wiring.

The reference's `main.py:23-27` runs the VIBE and MEVA consumer evals as part
of the main pipeline (reference: scripts/test.py:141-301: dynamic import of
the external repo, load `ckpt['gen_state_dict']`, evaluate before/after
regressors through the video model). Here that becomes: load the torch file,
sniff the GRU layout from the tensor shapes (hidden size, layer count,
bidirectionality — the reference hardcodes them per checkpoint), convert to
flax variables, splice the ResNet backbone from the SPIN checkpoint (the
reference's VIBE_Demo/MEVA_demo pull hmr weights from SPIN's pretrained file,
scripts/test.py:146-195), and return the frame-level and sequence-level
consumer callables for `harness.evaluate_consumer` /
`evaluate_consumer_sequences`.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import numpy as np

from jrr_tpu.models import convert_util

# (backbone params, backbone batch_stats) of a random full-model init —
# filled on first demo-path (no SPIN checkpoint) consumer build, reused after.
_RANDOM_BACKBONE = None


def load_gen_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Torch checkpoint file → numpy state dict (VIBE/MEVA layouts: the
    generator weights live under ['gen_state_dict']; a bare state dict at the
    root also loads)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("gen_state_dict", ckpt) if isinstance(ckpt, dict) else ckpt
    return {
        k: np.asarray(v.detach() if hasattr(v, "detach") else v)
        for k, v in sd.items()
    }


def sniff_temporal_layout(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """Infer (hidden_size, n_layers, bidirectional[, latent_dim, vae_hidden])
    from the checkpoint's own tensor shapes.

    The reference hardcodes these per artifact (VIBE_Demo: n_layers=2,
    hidden 1024, scripts/test.py:153-159; MEVA: from its cfg yaml,
    scripts/test.py:180-189); sniffing them makes the CLI robust to any
    published variant and to demo-scale fabricated checkpoints."""
    view = convert_util.StateDictView(sd, "gen_state_dict")
    n_layers = 0
    while f"encoder.gru.weight_ih_l{n_layers}" in view:
        n_layers += 1
    if n_layers == 0:
        # Raise with the full diff report of what IS in the file.
        view["encoder.gru.weight_ih_l0"]
    meta: Dict[str, Any] = {
        "hidden_size": int(view["encoder.gru.weight_ih_l0"].shape[0]) // 3,
        "n_layers": n_layers,
        "bidirectional": "encoder.gru.weight_ih_l0_reverse" in view,
    }
    if "vae_model.e_mu.weight" in view:
        meta["latent_dim"] = int(view["vae_model.e_mu.weight"].shape[0])
        meta["vae_hidden"] = int(view["vae_model.d_gru.weight_hh_l0"].shape[1])
    return meta


def _spin_backbone_variables(
    spin_checkpoint: str, spin_mean_params: Optional[str] = None
):
    import torch

    from jrr_tpu.models import spin as spin_lib

    ckpt = torch.load(spin_checkpoint, map_location="cpu", weights_only=False)
    sd = ckpt.get("model", ckpt) if isinstance(ckpt, dict) else ckpt
    sd = {
        k: np.asarray(v.detach() if hasattr(v, "detach") else v)
        for k, v in sd.items()
    }
    mean = None
    if spin_mean_params:
        with np.load(spin_mean_params) as f:
            mean = {k: f[k] for k in f.files}
    return spin_lib.convert_torch_spin_checkpoint(sd, mean)


def build_consumer(
    kind: str,
    checkpoint_path: str,
    smpl_model,
    j_num_verts: Optional[int] = None,
    spin_checkpoint: Optional[str] = None,
    spin_mean_params: Optional[str] = None,
    seqlen: int = 16,
) -> Tuple[Any, Any, Dict[str, Any]]:
    """Returns (consumer, seq_consumer, layout_meta) for 'vibe' or 'meva'.

    Without a SPIN checkpoint the ResNet backbone is RANDOM-initialized (the
    eval still runs end to end, but its numbers are meaningless — the
    reference always has the pretrained hmr backbone); a loud warning says so.
    """
    import jax

    from jrr_tpu.models import meva as meva_lib, temporal as temporal_lib

    sd = load_gen_state_dict(checkpoint_path)
    meta = sniff_temporal_layout(sd)

    backbone = None
    if spin_checkpoint is not None:
        backbone = _spin_backbone_variables(spin_checkpoint, spin_mean_params)

    if kind == "vibe":
        model = temporal_lib.TemporalPoseModel(
            hidden_size=meta["hidden_size"], n_layers=meta["n_layers"],
            bidirectional=meta["bidirectional"],
        )
        variables = temporal_lib.convert_torch_vibe_checkpoint(
            sd, backbone_variables=backbone, hidden_size=meta["hidden_size"],
            n_layers=meta["n_layers"], bidirectional=meta["bidirectional"],
        )
    elif kind == "meva":
        model = meva_lib.MEVAPoseModel(
            hidden_size=meta["hidden_size"], n_layers=meta["n_layers"],
            bidirectional=meta["bidirectional"],
            latent_dim=meta.get("latent_dim", 1024),
            vae_hidden=meta.get("vae_hidden", 1024),
        )
        variables = meva_lib.convert_torch_meva_checkpoint(
            sd, backbone_variables=backbone, hidden_size=meta["hidden_size"],
            n_layers=meta["n_layers"], bidirectional=meta["bidirectional"],
            vae_hidden=meta.get("vae_hidden", 1024),
        )
    else:
        raise ValueError(f"unknown consumer kind {kind!r} (vibe|meva)")

    if "backbone" not in variables["params"]:
        print(
            f"WARNING: no --spin-checkpoint given — the {kind.upper()} "
            "consumer's ResNet backbone is RANDOM-initialized; the eval "
            "exercises the full path but its numbers are not meaningful "
            "(the reference splices SPIN's pretrained hmr backbone, "
            "scripts/test.py:146-195)."
        )
        global _RANDOM_BACKBONE
        if _RANDOM_BACKBONE is None:
            # The ResNet-50 backbone submodule is identical across consumer
            # kinds/configs, and this init exists only to fill the demo
            # (no-SPIN) path with SOME weights — cache it so building both
            # VIBE and MEVA consumers pays the full-model init once.
            rnd = model.init(
                jax.random.PRNGKey(0), np.zeros((1, 2, 3, 224, 224), np.float32)
            )
            _RANDOM_BACKBONE = (
                rnd["params"]["backbone"], rnd["batch_stats"]["backbone"]
            )
        variables["params"]["backbone"] = _RANDOM_BACKBONE[0]
        variables.setdefault("batch_stats", {})
        variables["batch_stats"]["backbone"] = _RANDOM_BACKBONE[1]

    consumer = temporal_lib.make_temporal_consumer(
        smpl_model, model, variables, seqlen=seqlen
    )
    seq_consumer = temporal_lib.make_sequence_consumer(smpl_model, model, variables)
    return consumer, seq_consumer, meta
