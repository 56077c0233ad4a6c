"""jrr_tpu — a TPU-native (JAX / XLA / Pallas / pjit) joint-regressor-refinement framework.

A ground-up rebuild of the capabilities of ubc-vision/joint-regressor-refinement
(CRV 2022, "A Simple Method to Boost Human Pose Estimation Accuracy by
Correcting the Joint Regressor for the Human3.6m Dataset"), designed TPU-first:

- the SMPL body-model forward (shape/pose blendshapes, forward kinematics,
  linear-blend skinning, joint regression) is a fused, jit/vmap-able XLA program
  sized for the MXU;
- the two-stage Adam refinement of (pose θ, shape β, camera t) compiles to a
  single jitted `lax.scan`, vmapped over frames;
- the differentiable soft-silhouette renderer is a tile-binned rasterizer
  (pure-XLA reference + Pallas kernel);
- scaling is data-parallel over a `jax.sharding.Mesh` with XLA collectives over
  ICI — frames are i.i.d., so the frame axis is the scaling axis.

This package re-implements behavior studied in /root/reference (cited per
module as `reference: <file>:<lines>`); it shares no code with it.
"""

__version__ = "0.1.0"
