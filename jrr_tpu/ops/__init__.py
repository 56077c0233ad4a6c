"""Core numeric ops: rotation math, regressor application, sampling, Procrustes."""
