"""Import the ACTUAL reference implementation as the parity oracle.

`load()` registers the shims (tests/oracle/shims.py), then imports the
reference's model code from /root/reference/src/f5_tts directly — bypassing
`f5_tts.model.__init__` (which pulls in Trainer and its heavy deps:
accelerate, ema_pytorch, wandb) via stub parent packages with explicit
`__path__`s.

This makes the reference code itself runnable on torch CPU, so parity tests
compare the JAX framework against the real reference
(model/{cfm,modules,utils}.py, backbones/{dit,mmdit,unett}.py) rather than
from-spec twins written by the same hand.
"""

from __future__ import annotations

import importlib
import sys
import types

REF_SRC = "/root/reference/src"

_ns = None


def load():
    """Return a namespace of imported reference modules (cached)."""
    global _ns
    if _ns is not None:
        return _ns

    from . import shims

    shims.install()

    def _stub_pkg(name: str, path: str) -> None:
        if name in sys.modules:
            return
        pkg = types.ModuleType(name)
        pkg.__path__ = [path]
        pkg.__package__ = name
        sys.modules[name] = pkg

    # f5_tts/__init__.py is empty, but stub it anyway so nothing from the
    # reference root (api.py etc.) executes; f5_tts.model.__init__ imports
    # Trainer, which we must bypass.
    _stub_pkg("f5_tts", f"{REF_SRC}/f5_tts")
    _stub_pkg("f5_tts.model", f"{REF_SRC}/f5_tts/model")
    _stub_pkg("f5_tts.model.backbones", f"{REF_SRC}/f5_tts/model/backbones")
    _stub_pkg("f5_tts.eval", f"{REF_SRC}/f5_tts/eval")
    _stub_pkg("f5_tts.ppg", f"{REF_SRC}/f5_tts/ppg")
    _stub_pkg("f5_tts.ppg.wenet", f"{REF_SRC}/f5_tts/ppg/wenet")
    _stub_pkg("f5_tts.ppg.wenet.transformer", f"{REF_SRC}/f5_tts/ppg/wenet/transformer")
    _stub_pkg("f5_tts.ppg.wenet.utils", f"{REF_SRC}/f5_tts/ppg/wenet/utils")
    # f5_tts.durpred's real __init__ is safe (torch/einops/numpy + numba shim).

    _ns = types.SimpleNamespace(
        modules=importlib.import_module("f5_tts.model.modules"),
        utils=importlib.import_module("f5_tts.model.utils"),
        dit=importlib.import_module("f5_tts.model.backbones.dit"),
        mmdit=importlib.import_module("f5_tts.model.backbones.mmdit"),
        unett=importlib.import_module("f5_tts.model.backbones.unett"),
        cfm=importlib.import_module("f5_tts.model.cfm"),
        durpred=importlib.import_module("f5_tts.durpred"),
        monotonic_align=importlib.import_module("f5_tts.durpred.monotonic_align"),
        utils_eval=importlib.import_module("f5_tts.eval.utils_eval"),
        wenet_subsampling=importlib.import_module(
            "f5_tts.ppg.wenet.transformer.subsampling"),
        wenet_embedding=importlib.import_module(
            "f5_tts.ppg.wenet.transformer.embedding"),
        wenet_decoder=importlib.import_module(
            "f5_tts.ppg.wenet.transformer.decoder"),
        wenet_label_smoothing=importlib.import_module(
            "f5_tts.ppg.wenet.transformer.label_smoothing_loss"),
        wenet_common=importlib.import_module("f5_tts.ppg.wenet.utils.common"),
    )
    return _ns
