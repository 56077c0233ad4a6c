"""Converter round-trip at the REAL published checkpoint shapes (VERDICT r4
missing item 1 / next-round item 6).

Every fast consumer test fabricates demo-small checkpoints (GRU hidden 8);
a full-size-only shape bug in convert→consume would therefore surface only
the day a real published file appears. These slow-marked tests push
fabricated checkpoints at the PUBLISHED dimensions through the full path:

- VIBE: seqlen 16, n_layers 2, hidden_size 1024, add_linear, use_residual —
  exactly the constructor call of the reference
  (reference: scripts/test.py:153-166).
- MEVA: TGRU n_layers 2 / hidden 1024 (the train_meva_2 cfg consumed at
  reference: scripts/test.py:180-190) + a motion-VAE branch at latent 32 /
  vae hidden 1024.

Each checkpoint goes file → load_gen_state_dict → sniff → convert →
consumer AND seq_consumer forwards at full input shapes, asserting output
shapes and finiteness.
"""

import numpy as np
import pytest

from tests.test_consumer_cli import _fabricate_meva_gen_sd, _fabricate_vibe_gen_sd

pytestmark = pytest.mark.slow

SEQLEN = 16


def _run_consumer(kind, sd, torch, tmp_path):
    import jax.numpy as jnp

    from jrr_tpu.evals import consumers
    from jrr_tpu.models import smpl as smpl_lib
    from jrr_tpu.ops import jreg as jreg_lib

    path = str(tmp_path / f"{kind}_model.pth.tar")
    torch.save({"gen_state_dict": sd, "performance": 56.5}, path)

    model = smpl_lib.synthetic_smpl_model(seed=0, num_verts=64, num_faces=100)
    consumer, seq_consumer, meta = consumers.build_consumer(
        kind, path, model, seqlen=SEQLEN
    )
    assert meta["hidden_size"] == 1024 and meta["n_layers"] == 2

    rng = np.random.default_rng(0)
    j_reg = np.abs(rng.normal(size=(17, model.num_verts))).astype(np.float32)
    norms = jnp.stack([
        jreg_lib.normalize_jreg(jnp.asarray(j_reg)),
        jreg_lib.normalize_jreg(jnp.asarray(j_reg * 2.0)),
    ])

    # Frame-level consumer at the production crop shape.
    img = jnp.asarray(rng.normal(size=(4, 3, 224, 224)).astype(np.float32))
    kp = np.asarray(consumer(img, norms))
    assert kp.shape == (2, 4, 17, 3)
    assert np.isfinite(kp).all()

    # Sequence consumer at the published seqlen 16 (one chunk).
    video = jnp.asarray(
        rng.normal(size=(1, SEQLEN, 3, 224, 224)).astype(np.float32)
    )
    kp_seq = np.asarray(seq_consumer(video, norms))
    assert kp_seq.shape == (2, 1, SEQLEN, 17, 3)
    assert np.isfinite(kp_seq).all()
    return meta


def test_vibe_published_shapes(tmp_path):
    torch = pytest.importorskip("torch")
    sd = _fabricate_vibe_gen_sd(torch, H=1024, D=2048)
    meta = _run_consumer("vibe", sd, torch, tmp_path)
    assert meta["bidirectional"] is False


def test_meva_published_shapes(tmp_path):
    torch = pytest.importorskip("torch")
    sd = _fabricate_meva_gen_sd(torch, H=1024, D=2048, latent=32)
    meta = _run_consumer("meva", sd, torch, tmp_path)
    assert meta["latent_dim"] == 32 and meta["vae_hidden"] == 1024
