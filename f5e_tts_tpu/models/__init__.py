"""Model layer: DiT/UNetT/MMDiT backbones, CFM wrapper, Vocos vocoder, Conformer PPG."""
