"""Model components: SMPL body model, adversarial priors, SPIN initializer."""
