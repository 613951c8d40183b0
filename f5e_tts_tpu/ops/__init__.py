"""Numerical building blocks: mel frontend, RoPE, norms, convs, attention, VQ, MAS."""
