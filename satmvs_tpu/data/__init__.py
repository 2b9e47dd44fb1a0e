"""Data layer: formats, sample lists, preprocessing, datasets (reference L1)."""
