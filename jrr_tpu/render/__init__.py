"""Differentiable rendering: perspective camera and soft-silhouette rasterizer."""
