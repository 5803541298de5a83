"""Flax model zoo: pseudo-3D SD UNet, AnimateDiff motion UNet, SD3 MMDiT,
VAEs, text encoders, and torch->Flax weight converters."""
