"""Training: optimizer, EMA, jitted train step, trainer loop, datasets."""
