"""Method layer: inversion, stylization, mask propagation, flow smoothing."""
