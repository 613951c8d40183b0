"""ECAPA-TDNN head golden parity: JAX implementation vs a from-spec torch twin
built with the reference's module/key layout (ecapa_tdnn.py:17-331), so the
same state dict drives both through ecapa_from_torch."""

import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn as nn
import torch.nn.functional as F

from f5e_tts_tpu.eval.ecapa import (ECAPAConfig, combine_hidden_states,
                                    ecapa_embed, ecapa_from_torch)

CFG = ECAPAConfig(feat_dim=16, channels=16, emb_dim=8, scale=8,
                  se_bottleneck=8, attention_channels=8, num_feat_layers=3)


class _ConvReluBn(nn.Module):
    def __init__(self, cin, cout, k=1, pad=0, dilation=1):
        super().__init__()
        self.conv = nn.Conv1d(cin, cout, k, padding=pad, dilation=dilation)
        self.bn = nn.BatchNorm1d(cout)

    def forward(self, x):
        return self.bn(F.relu(self.conv(x)))


class _Res2(nn.Module):
    def __init__(self, ch, k, pad, dilation, scale):
        super().__init__()
        self.scale, self.width = scale, ch // scale
        n = scale - 1
        self.convs = nn.ModuleList(
            [nn.Conv1d(self.width, self.width, k, padding=pad, dilation=dilation)
             for _ in range(n)])
        self.bns = nn.ModuleList([nn.BatchNorm1d(self.width) for _ in range(n)])

    def forward(self, x):
        parts = torch.split(x, self.width, dim=1)
        outs, sp = [], None
        for i in range(self.scale - 1):
            sp = parts[i] if i == 0 else sp + parts[i]
            sp = self.bns[i](F.relu(self.convs[i](sp)))
            outs.append(sp)
        outs.append(parts[-1])
        return torch.cat(outs, dim=1)


class _SE(nn.Module):
    def __init__(self, ch, bott):
        super().__init__()
        self.linear1 = nn.Linear(ch, bott)
        self.linear2 = nn.Linear(bott, ch)

    def forward(self, x):
        s = torch.sigmoid(self.linear2(F.relu(self.linear1(x.mean(dim=2)))))
        return x * s.unsqueeze(2)


class _Block(nn.Module):
    def __init__(self, ch, dilation, scale, bott):
        super().__init__()
        self.Conv1dReluBn1 = _ConvReluBn(ch, ch)
        self.Res2Conv1dReluBn = _Res2(ch, 3, dilation, dilation, scale)
        self.Conv1dReluBn2 = _ConvReluBn(ch, ch)
        self.SE_Connect = _SE(ch, bott)

    def forward(self, x):
        h = self.SE_Connect(self.Conv1dReluBn2(
            self.Res2Conv1dReluBn(self.Conv1dReluBn1(x))))
        return h + x


class _Twin(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        ch, cat = cfg.channels, cfg.channels * 3
        self.feature_weight = nn.Parameter(torch.randn(cfg.num_feat_layers))
        self.layer1 = _ConvReluBn(cfg.feat_dim, ch, k=5, pad=2)
        self.layer2 = _Block(ch, 2, cfg.scale, cfg.se_bottleneck)
        self.layer3 = _Block(ch, 3, cfg.scale, cfg.se_bottleneck)
        self.layer4 = _Block(ch, 4, cfg.scale, cfg.se_bottleneck)
        self.conv = nn.Conv1d(cat, cat, 1)
        self.pooling = nn.Module()
        self.pooling.linear1 = nn.Conv1d(cat, cfg.attention_channels, 1)
        self.pooling.linear2 = nn.Conv1d(cfg.attention_channels, cat, 1)
        self.bn = nn.BatchNorm1d(cat * 2)
        self.linear = nn.Linear(cat * 2, cfg.emb_dim)

    def forward(self, hidden):  # hidden: (L, B, T, C)
        w = F.softmax(self.feature_weight, dim=-1)
        x = torch.einsum("l,lbtc->btc", w, hidden) + 1e-6
        x = F.instance_norm(x.transpose(1, 2))  # (B, C, T)
        o1 = self.layer1(x)
        o2 = self.layer2(o1)
        o3 = self.layer3(o2)
        o4 = self.layer4(o3)
        h = torch.cat([o2, o3, o4], dim=1)
        h = F.relu(self.conv(h))
        a = torch.softmax(self.pooling.linear2(torch.tanh(self.pooling.linear1(h))), dim=2)
        mean = (a * h).sum(dim=2)
        std = torch.sqrt(((a * h * h).sum(dim=2) - mean**2).clamp(min=1e-9))
        h = self.bn(torch.cat([mean, std], dim=1))
        return self.linear(h)


def _randomize_bn(m, rng):
    for mod in m.modules():
        if isinstance(mod, nn.BatchNorm1d):
            mod.running_mean.copy_(torch.from_numpy(
                rng.standard_normal(mod.running_mean.shape).astype(np.float32) * 0.2))
            mod.running_var.copy_(torch.from_numpy(
                (np.abs(rng.standard_normal(mod.running_var.shape)) + 0.5).astype(np.float32)))


def test_ecapa_matches_torch_twin(rng):
    torch.manual_seed(0)
    twin = _Twin(CFG).eval()
    with torch.no_grad():
        _randomize_bn(twin, rng)

    L, B, T = CFG.num_feat_layers, 2, 24
    hidden = rng.standard_normal((L, B, T, CFG.feat_dim)).astype(np.float32)

    with torch.no_grad():
        ref = twin(torch.from_numpy(hidden)).numpy()

    sd = {k: v.detach().numpy().astype(np.float32)
          for k, v in twin.state_dict().items()}
    params = jax.tree.map(jnp.asarray, ecapa_from_torch(sd, CFG))
    feats = combine_hidden_states(params["feature_weight"], jnp.asarray(hidden))
    out = np.asarray(ecapa_embed(params, CFG, feats))

    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-4)


def test_ecapa_embedding_is_speaker_discriminative_shape(rng):
    """Different inputs give different, finite embeddings; batch invariance."""
    torch.manual_seed(1)
    twin = _Twin(CFG).eval()
    sd = {k: v.detach().numpy().astype(np.float32)
          for k, v in twin.state_dict().items()}
    params = jax.tree.map(jnp.asarray, ecapa_from_torch(sd, CFG))

    L, T = CFG.num_feat_layers, 30
    h1 = rng.standard_normal((L, 1, T, CFG.feat_dim)).astype(np.float32)
    h2 = rng.standard_normal((L, 1, T, CFG.feat_dim)).astype(np.float32)
    e1 = np.asarray(ecapa_embed(params, CFG, combine_hidden_states(
        params["feature_weight"], jnp.asarray(h1))))
    e2 = np.asarray(ecapa_embed(params, CFG, combine_hidden_states(
        params["feature_weight"], jnp.asarray(h2))))
    assert e1.shape == (1, CFG.emb_dim)
    assert np.isfinite(e1).all() and np.isfinite(e2).all()
    assert np.abs(e1 - e2).max() > 1e-4

    # batched == per-item
    both = np.concatenate([h1, h2], axis=1)
    eb = np.asarray(ecapa_embed(params, CFG, combine_hidden_states(
        params["feature_weight"], jnp.asarray(both))))
    np.testing.assert_allclose(eb[0], e1[0], rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(eb[1], e2[0], rtol=1e-5, atol=1e-5)
