"""The refinement engine: losses and the two-stage jitted optimization loops."""
