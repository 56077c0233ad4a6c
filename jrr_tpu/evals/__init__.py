"""Evaluation: MPJPE / PA-MPJPE metrics and the protocol-2 harness."""
