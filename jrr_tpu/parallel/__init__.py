"""Scaling: device mesh, shardings, and data-parallel execution.

The workload is embarrassingly parallel over frames (SURVEY §2c): the single
scaling axis is the frame batch, sharded over a 1-D `jax.sharding.Mesh`.
Shared state (J-regressor, discriminators) is replicated; its gradients are
batch means, so XLA inserts the `psum`/all-reduce over ICI automatically when
the jitted step's outputs are required replicated. Tensor/pipeline/expert
parallelism are deliberately not built — the largest matmul in the model is
(17×6890)·(6890×3) (see SURVEY §2c for the decision record).
"""
