"""AOT export/import of jitted computations (jax.export).

The TRT-LLM runtime's moral equivalent of engine files: serialize the lowered
sampler per duration bucket so serving startup skips JIT compilation entirely
(compiles on this environment's remote-compile path take minutes).
"""

from __future__ import annotations

import os
from typing import Callable, Sequence

import jax
import jax.numpy as jnp


def export_fn(fn: Callable, args, path: str) -> None:
    """Serialize a jitted function specialized to `args` shapes into `path`."""
    from jax import export as jexport

    exp = jexport.export(jax.jit(fn))(*jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), args))
    blob = exp.serialize()
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as f:
        f.write(blob)


def load_fn(path: str) -> Callable:
    """Load a serialized computation; returns a callable over device arrays."""
    from jax import export as jexport

    with open(path, "rb") as f:
        exp = jexport.deserialize(f.read())
    return jax.jit(exp.call)


def _variant_tag(timesteps=None, cfg_strength=None) -> str:
    """Filename tag for non-default sampler variants (EPSS grid / cfg
    override). Default serving keeps the historical untagged name so existing
    engine dirs stay valid. The grid tags by content hash: the same
    pruned_sway_timesteps tuple always produces the same tag on exporter and
    loader sides."""
    import hashlib

    tag = ""
    if timesteps is not None:
        key = ",".join(f"{float(t):.9e}" for t in timesteps)
        tag += "_ts" + hashlib.sha1(key.encode()).hexdigest()[:8]
    if cfg_strength is not None:
        tag += f"_cfg{float(cfg_strength):g}"
    return tag


def export_sampler_buckets(engine, ref_frames: int, out_dir: str,
                           buckets: Sequence[int] | None = None,
                           nfe: int = 32, text_len: int = 256,
                           timesteps: Sequence[float] | None = None,
                           cfg_strength: float | None = None) -> list:
    """Export the folded-CFG sampler for each duration bucket.

    Returns the list of written paths. Serving loads them with load_fn and
    calls with (params, cond, lens, duration, text_ids, key-ints).

    timesteps bakes an explicit ODE grid (EPSS pruned schedules — nfe becomes
    len(grid)-1); cfg_strength bakes a non-default guidance weight (0 = the
    CFG-distilled single-pass serving mode).
    """
    from f5e_tts_tpu.models import cfm as fcfm

    ts_grid = tuple(float(t) for t in timesteps) if timesteps is not None else None
    cfg = (engine.infer_cfg.cfg_strength if cfg_strength is None else cfg_strength)
    eff_nfe = len(ts_grid) - 1 if ts_grid is not None else nfe
    tag = _variant_tag(ts_grid, cfg_strength)
    buckets = list(buckets or engine.buckets)
    paths = []
    for bucket in buckets:
        if bucket <= ref_frames:
            continue

        def synth(params, cond, lens, duration, text_ids, seed):
            inputs = fcfm.prepare_inputs(cond, lens, duration, bucket, text_ids=text_ids)
            out, _ = fcfm.sample(params, engine.state, engine.arch, engine.cfm, inputs,
                                 jax.random.PRNGKey(seed[0]), steps=eff_nfe,
                                 cfg_strength=cfg,
                                 sway_coef=engine.infer_cfg.sway_sampling_coef,
                                 use_mask=True, timesteps=ts_grid,
                                 compute_dtype=engine.compute_dtype)
            return out

        args = (
            engine.params,
            jnp.zeros((1, ref_frames, engine.mel.n_mel_channels), jnp.float32),
            jnp.zeros((1,), jnp.int32),
            jnp.zeros((1,), jnp.int32),
            jnp.zeros((1, text_len), jnp.int32),
            jnp.zeros((1,), jnp.int32),
        )
        path = os.path.join(
            out_dir,
            f"sampler_nfe{eff_nfe}{tag}_ref{ref_frames}_b{bucket}_t{text_len}.jaxexport")
        export_fn(synth, args, path)
        paths.append(path)
    return paths


def find_sampler_engine(engine_dir: str, nfe: int, ref_frames: int,
                        bucket: int, min_text_len: int,
                        timesteps: Sequence[float] | None = None,
                        cfg_strength: float | None = None):
    """Locate an exported sampler matching (nfe, ref_frames, bucket, variant)
    whose baked text length covers `min_text_len` (extra -1 text padding is
    filler and does not change the output). Returns (path, text_len) or None.

    timesteps/cfg_strength select variant engines (EPSS grid / cfg override,
    matched by the export-side tag); None selects the default untagged one."""
    import re

    best = None
    if not os.path.isdir(engine_dir):
        return None
    if timesteps is not None:
        nfe = len(tuple(timesteps)) - 1
    tag = re.escape(_variant_tag(timesteps, cfg_strength))
    pat = re.compile(
        rf"^sampler_nfe{nfe}{tag}_ref{ref_frames}_b{bucket}_t(\d+)\.jaxexport$")
    for name in os.listdir(engine_dir):
        m = pat.match(name)
        if not m:
            continue
        tl = int(m.group(1))
        if tl >= min_text_len and (best is None or tl < best[1]):
            best = (os.path.join(engine_dir, name), tl)
    return best


def export_ppg_buckets(extractor, out_dir: str,
                       frame_buckets: Sequence[int] = (400, 800, 1600, 3200),
                       batch: int = 1) -> list:
    """Export the frozen PPG extractor per fbank-length bucket.

    The wenet deployment exports (bin/export_jit.py / export_onnx.py); here
    the serialized artifact is the lowered mel->PPG computation, so offline
    extraction and serving skip conformer JIT compilation. Call with
    (params, feats (B, T, idim) fp32, feat_lens (B,) int32).
    """
    import dataclasses

    paths = []
    for t in frame_buckets:

        def fn(params, feats, lens):
            ex = dataclasses.replace(extractor, params=params)
            return ex.mel_to_ppg(feats, lens)

        args = (
            extractor.params,
            jnp.zeros((batch, t, extractor.cfg.input_dim), jnp.float32),
            jnp.full((batch,), t, jnp.int32),
        )
        path = os.path.join(out_dir, f"ppg_b{batch}_t{t}.jaxexport")
        export_fn(fn, args, path)
        paths.append(path)
    return paths


def find_ppg_engine(engine_dir: str, batch: int, t: int):
    """Smallest exported PPG bucket covering `t` frames at this batch size.
    Returns (path, bucket_t) or None (caller pads feats to bucket_t)."""
    import re

    if not os.path.isdir(engine_dir):
        return None
    best = None
    pat = re.compile(rf"^ppg_b{batch}_t(\d+)\.jaxexport$")
    for name in os.listdir(engine_dir):
        m = pat.match(name)
        if not m:
            continue
        bt = int(m.group(1))
        if bt >= t and (best is None or bt < best[1]):
            best = (os.path.join(engine_dir, name), bt)
    return best
