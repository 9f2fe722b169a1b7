"""Data layer: motion encoding, normalization statistics, datasets."""
