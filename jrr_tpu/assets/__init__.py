"""Bundled data artifacts.

`retrained_j_regressor.npz` holds the reference repo's shipped deliverable —
the float32 (17, 6890) retrained H3.6M joint regressor
(reference: models/retrained_J_Regressor.pt, README.md:11-12) — converted
one-time from the torch tensor format. It is model weights (data), not code.
"""

from __future__ import annotations

import os

import numpy as np

_ASSET_DIR = os.path.dirname(os.path.abspath(__file__))


def load_retrained_j_regressor() -> np.ndarray:
    """The paper's retrained (17, 6890) joint regressor, float32."""
    with np.load(os.path.join(_ASSET_DIR, "retrained_j_regressor.npz")) as f:
        return f["j_regressor"].astype(np.float32)
