"""Training loops: pose VAE and temporal predictor (optax)."""
