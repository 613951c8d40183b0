"""sys.modules shims that make the reference model code importable offline.

The reference (/root/reference/src/f5_tts/model/*) depends on a handful of
packages that are not installed in this environment: x_transformers,
torchaudio, librosa, torchdiffeq, numba, pypinyin.  Each shim below
re-implements, from the public documentation / published semantics of the
upstream package, exactly the slice the reference touches — enough for the
reference code itself to run as the parity oracle (torch CPU).

None of this code runs in the framework; it exists only under tests/.
"""

from __future__ import annotations

import math
import sys
import types

import torch


# ---------------------------------------------------------------------------
# x_transformers (lucidrains) — RotaryEmbedding + apply_rotary_pos_emb.
# Semantics of x_transformers>=1.31.14 (reference pyproject.toml:43):
# interleaved-pair ("(d r)" with r=2) rotation, GPT-NeoX style.
# ---------------------------------------------------------------------------


def _rotate_half(x: torch.Tensor) -> torch.Tensor:
    # rearrange('... (d r) -> ... d r', r=2); stack((-x2, x1)); flatten back
    x1 = x[..., 0::2]
    x2 = x[..., 1::2]
    return torch.stack((-x2, x1), dim=-1).flatten(-2)


def apply_rotary_pos_emb(t: torch.Tensor, freqs: torch.Tensor, scale=1):
    rot_dim, seq_len, orig_dtype = freqs.shape[-1], t.shape[-2], t.dtype
    freqs = freqs[-seq_len:, :]
    if isinstance(scale, torch.Tensor):
        scale = scale[-seq_len:, :]
    if t.ndim == 4 and freqs.ndim == 3:
        freqs = freqs.unsqueeze(1)  # 'b n d -> b 1 n d'
    t, t_unrotated = t[..., :rot_dim], t[..., rot_dim:]
    t = (t * freqs.cos() * scale) + (_rotate_half(t) * freqs.sin() * scale)
    return torch.cat((t, t_unrotated), dim=-1).type(orig_dtype)


class RotaryEmbedding(torch.nn.Module):
    def __init__(
        self,
        dim,
        use_xpos=False,
        scale_base=512,
        interpolation_factor=1.0,
        base=10000,
        base_rescale_factor=1.0,
    ):
        super().__init__()
        # NTK-by-parts base rescale (identity at factor 1.0)
        base *= base_rescale_factor ** (dim / (dim - 2))
        inv_freq = 1.0 / (base ** (torch.arange(0, dim, 2).float() / dim))
        self.register_buffer("inv_freq", inv_freq)
        assert interpolation_factor >= 1.0
        self.interpolation_factor = interpolation_factor
        if use_xpos:
            raise NotImplementedError("xpos is never used by the reference")

    def forward_from_seq_len(self, seq_len):
        t = torch.arange(seq_len, device=self.inv_freq.device)
        return self.forward(t)

    def forward(self, t):
        freqs = (
            torch.einsum("i,j->ij", t.type_as(self.inv_freq), self.inv_freq)
            / self.interpolation_factor
        )
        freqs = torch.stack((freqs, freqs), dim=-1).flatten(-2)
        return freqs, 1.0


class RMSNorm(torch.nn.Module):
    # x_transformers.RMSNorm: F.normalize * sqrt(dim) * learned gain
    # (consumed by reference unett.py:17).
    def __init__(self, dim):
        super().__init__()
        self.scale = dim**0.5
        self.g = torch.nn.Parameter(torch.ones(dim))

    def forward(self, x):
        return torch.nn.functional.normalize(x, dim=-1) * self.scale * self.g


# ---------------------------------------------------------------------------
# torchaudio — transforms.MelSpectrogram only (reference modules.py:75-101
# uses power=1, center=True, norm=None, i.e. HTK mel scale, no filterbank
# normalisation).  Built on torch.stft.
# ---------------------------------------------------------------------------


def _hz_to_mel(freq: float, mel_scale: str = "htk") -> float:
    if mel_scale == "htk":
        return 2595.0 * math.log10(1.0 + freq / 700.0)
    # slaney
    f_min, f_sp = 0.0, 200.0 / 3
    mels = (freq - f_min) / f_sp
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = math.log(6.4) / 27.0
    if freq >= min_log_hz:
        mels = min_log_mel + math.log(freq / min_log_hz) / logstep
    return mels


def _mel_to_hz(mels: torch.Tensor, mel_scale: str = "htk") -> torch.Tensor:
    if mel_scale == "htk":
        return 700.0 * (10.0 ** (mels / 2595.0) - 1.0)
    f_min, f_sp = 0.0, 200.0 / 3
    freqs = f_min + f_sp * mels
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = math.log(6.4) / 27.0
    log_t = mels >= min_log_mel
    freqs[log_t] = min_log_hz * torch.exp(logstep * (mels[log_t] - min_log_mel))
    return freqs


def melscale_fbanks(
    n_freqs: int,
    f_min: float,
    f_max: float,
    n_mels: int,
    sample_rate: int,
    norm=None,
    mel_scale: str = "htk",
) -> torch.Tensor:
    # torchaudio.functional.melscale_fbanks semantics (note the integer
    # division in the linspace endpoint).
    all_freqs = torch.linspace(0, sample_rate // 2, n_freqs)
    m_min = _hz_to_mel(f_min, mel_scale)
    m_max = _hz_to_mel(f_max, mel_scale)
    m_pts = torch.linspace(m_min, m_max, n_mels + 2)
    f_pts = _mel_to_hz(m_pts, mel_scale)
    f_diff = f_pts[1:] - f_pts[:-1]
    slopes = f_pts.unsqueeze(0) - all_freqs.unsqueeze(1)  # (n_freqs, n_mels+2)
    down_slopes = (-1.0 * slopes[:, :-2]) / f_diff[:-1]
    up_slopes = slopes[:, 2:] / f_diff[1:]
    fb = torch.max(torch.zeros(1), torch.min(down_slopes, up_slopes))
    if norm == "slaney":
        enorm = 2.0 / (f_pts[2 : n_mels + 2] - f_pts[:n_mels])
        fb *= enorm.unsqueeze(0)
    return fb


class MelSpectrogram(torch.nn.Module):
    def __init__(
        self,
        sample_rate=16000,
        n_fft=400,
        win_length=None,
        hop_length=None,
        f_min=0.0,
        f_max=None,
        pad=0,
        n_mels=128,
        window_fn=torch.hann_window,
        power=2.0,
        normalized=False,
        center=True,
        pad_mode="reflect",
        onesided=True,
        norm=None,
        mel_scale="htk",
    ):
        super().__init__()
        self.n_fft = n_fft
        self.win_length = win_length if win_length is not None else n_fft
        self.hop_length = hop_length if hop_length is not None else self.win_length // 2
        self.power = power
        self.normalized = normalized
        self.center = center
        self.pad_mode = pad_mode
        assert pad == 0 and onesided and not normalized
        self.register_buffer("window", window_fn(self.win_length))
        fb = melscale_fbanks(
            n_fft // 2 + 1,
            f_min,
            f_max if f_max is not None else float(sample_rate // 2),
            n_mels,
            sample_rate,
            norm,
            mel_scale,
        )
        self.register_buffer("fb", fb)

    def forward(self, waveform: torch.Tensor) -> torch.Tensor:
        spec = torch.stft(
            waveform,
            self.n_fft,
            hop_length=self.hop_length,
            win_length=self.win_length,
            window=self.window,
            center=self.center,
            pad_mode=self.pad_mode,
            normalized=False,
            onesided=True,
            return_complex=True,
        )
        spec = spec.abs() ** self.power
        return (spec.transpose(-1, -2) @ self.fb).transpose(-1, -2)


def _torchaudio_load(path):
    """torchaudio.load for PCM16 wav files: ((C, N) float in [-1, 1], sr)."""
    import wave as wavmod

    import numpy as np

    with wavmod.open(str(path), "rb") as w:
        sr = w.getframerate()
        n = w.getnframes()
        c = w.getnchannels()
        pcm = np.frombuffer(w.readframes(n), np.int16).astype(np.float32) / 32768.0
    if c > 1:
        pcm = pcm.reshape(-1, c).T
    else:
        pcm = pcm[None, :]
    return torch.from_numpy(pcm.copy()), sr


class _Resample(torch.nn.Module):
    """Identity-rate only — the parity fixtures keep wavs at the target rate;
    real rate conversion would need torchaudio's sinc kernel."""

    def __init__(self, orig_freq, new_freq):
        super().__init__()
        if orig_freq != new_freq:
            raise NotImplementedError(
                "torchaudio.transforms.Resample shim only supports "
                "orig_freq == new_freq (keep oracle fixtures at the target rate)")

    def forward(self, x):
        return x


# ---------------------------------------------------------------------------
# librosa.filters.mel — slaney-scale slaney-norm filterbank (reference
# modules.py:30-72, bigvgan flavor; defaults htk=False norm='slaney').
# ---------------------------------------------------------------------------


def _librosa_mel(
    *, sr, n_fft, n_mels=128, fmin=0.0, fmax=None, htk=False, norm="slaney", dtype=None
):
    import numpy as np

    if fmax is None:
        fmax = float(sr) / 2
    scale = "htk" if htk else "slaney"
    fftfreqs = np.linspace(0, float(sr) / 2, 1 + n_fft // 2)
    m_min = _hz_to_mel(fmin, scale)
    m_max = _hz_to_mel(fmax, scale)
    m_pts = torch.linspace(m_min, m_max, n_mels + 2)
    mel_f = _mel_to_hz(m_pts, scale).numpy().astype(np.float64)
    fdiff = np.diff(mel_f)
    ramps = np.subtract.outer(mel_f, fftfreqs)
    weights = np.zeros((n_mels, 1 + n_fft // 2))
    for i in range(n_mels):
        lower = -ramps[i] / fdiff[i]
        upper = ramps[i + 2] / fdiff[i + 1]
        weights[i] = np.maximum(0, np.minimum(lower, upper))
    if norm == "slaney":
        enorm = 2.0 / (mel_f[2 : n_mels + 2] - mel_f[:n_mels])
        weights *= enorm[:, np.newaxis]
    elif norm is not None:
        raise NotImplementedError(norm)
    return weights.astype(dtype if dtype is not None else np.float32)


# ---------------------------------------------------------------------------
# torchdiffeq.odeint — fixed-grid euler / midpoint (the reference only ever
# sets method='euler' or 'midpoint', cfm.py:39-42).  Returns the trajectory
# stacked over the supplied grid like upstream torchdiffeq.
# ---------------------------------------------------------------------------


def odeint(func, y0, t, method="euler", **unused_kwargs):
    ys = [y0]
    y = y0
    for i in range(t.shape[0] - 1):
        t0, t1 = t[i], t[i + 1]
        dt = t1 - t0
        if method == "euler":
            y = y + dt * func(t0, y)
        elif method == "midpoint":
            k1 = func(t0, y)
            y = y + dt * func(t0 + dt / 2, y + (dt / 2) * k1)
        else:
            raise NotImplementedError(f"odeint shim: method={method}")
        ys.append(y)
    return torch.stack(ys)


# ---------------------------------------------------------------------------
# numba — identity @jit decorator (MAS kernel runs as plain Python).
# ---------------------------------------------------------------------------


class _NumbaType:
    def __getitem__(self, item):
        return self

    def __call__(self, *args, **kwargs):
        return self


def _numba_jit(signature_or_function=None, **kwargs):
    if callable(signature_or_function) and not isinstance(signature_or_function, _NumbaType):
        return signature_or_function

    def deco(fn):
        return fn

    return deco


# ---------------------------------------------------------------------------
# pypinyin — lazy_pinyin backed by a vendored fixture table (tone-sandhi
# TONE3 outputs for the test corpus).  Unknown inputs raise so a test can
# never silently diverge from real pypinyin.
# ---------------------------------------------------------------------------


class _PinyinStyle:
    TONE = "tone"
    TONE3 = "tone3"
    NORMAL = "normal"


def _lazy_pinyin(seg, style=None, tone_sandhi=False, **kwargs):
    from . import pinyin_fixture

    return pinyin_fixture.lookup(seg, style or "tone3")


# ---------------------------------------------------------------------------


def _module(name: str, **attrs) -> types.ModuleType:
    import importlib.machinery

    mod = types.ModuleType(name)
    # a real ModuleSpec so importlib.util.find_spec (e.g. transformers'
    # availability probes) doesn't choke on the shim
    mod.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod
    return mod


_installed = False


def install() -> None:
    """Register all shim modules in sys.modules (idempotent)."""
    global _installed
    if _installed:
        return
    _installed = True

    if "x_transformers" not in sys.modules:
        xt = _module("x_transformers", RMSNorm=RMSNorm)
        xt.x_transformers = _module(
            "x_transformers.x_transformers",
            RotaryEmbedding=RotaryEmbedding,
            apply_rotary_pos_emb=apply_rotary_pos_emb,
            RMSNorm=RMSNorm,
        )

    if "torchaudio" not in sys.modules:
        # set_audio_backend: removed in torchaudio 2.x, still called by the
        # reference wenet dataset modules — a no-op is faithful
        ta = _module("torchaudio", load=_torchaudio_load,
                     set_audio_backend=lambda *_a, **_k: None)
        ta.transforms = _module(
            "torchaudio.transforms", MelSpectrogram=MelSpectrogram,
            Resample=_Resample,
        )
        ta.functional = _module(
            "torchaudio.functional", melscale_fbanks=melscale_fbanks
        )

    if "librosa" not in sys.modules:
        lr = _module("librosa")
        lr.filters = _module("librosa.filters", mel=_librosa_mel)

    if "torchdiffeq" not in sys.modules:
        _module("torchdiffeq", odeint=odeint)

    if "numba" not in sys.modules:
        t = _NumbaType()
        _module(
            "numba",
            jit=_numba_jit,
            njit=_numba_jit,
            void=t,
            int32=t,
            int64=t,
            float32=t,
            float64=t,
            boolean=t,
        )

    if "pypinyin" not in sys.modules:
        _module("pypinyin", Style=_PinyinStyle, lazy_pinyin=_lazy_pinyin)
