"""Waveform distortion/augmentation vs the ACTUAL reference implementation
(ppg/wenet/dataset/wav_distortion.py) via the oracle shims, plus SNR/reverb
property tests for the AugmentWav port."""

import importlib
import sys
import types

import numpy as np
import pytest

from f5e_tts_tpu.data import wav_augment as wa

from tests.oracle import loader


@pytest.fixture(scope="module")
def ref_wd():
    loader.load()
    name = "f5_tts.ppg.wenet.dataset"
    if name not in sys.modules:
        pkg = types.ModuleType(name)
        pkg.__path__ = ["/root/reference/src/f5_tts/ppg/wenet/dataset"]
        pkg.__package__ = name
        sys.modules[name] = pkg
    return importlib.import_module(f"{name}.wav_distortion")


def _apply_scalar(fn, xs):
    return np.asarray([fn(float(v)) for v in xs], np.float32)


def test_poly_quad_gain_max_match_reference(ref_wd, rng):
    xs = np.concatenate([
        rng.uniform(-1, 1, 64).astype(np.float32),
        np.asarray([0.0, 1e-7, -1e-7, 0.5, -0.5, 0.999, -0.999], np.float32),
    ])
    cases = [
        (wa.make_poly_distortion({"a": 4, "m": 2, "n": 2}),
         ref_wd.make_poly_distortion({"a": 4, "m": 2, "n": 2})),
        (wa.make_quad_distortion(), ref_wd.make_quad_distortion()),
        (wa.make_gain_db({"db": 6.0}), ref_wd.make_gain_db({"db": 6.0})),
        (wa.make_max_distortion({"max_db": -10}),
         ref_wd.make_max_distortion({"max_db": -10})),
        (wa.make_max_distortion({"max_db": None}),
         ref_wd.make_max_distortion({"max_db": None})),
    ]
    for ours, ref in cases:
        np.testing.assert_allclose(ours(xs), _apply_scalar(ref, xs),
                                   rtol=1e-5, atol=1e-6)


def test_fence_jag_default_masks_match_reference(ref_wd, rng):
    xs = rng.uniform(-1, 1, 128).astype(np.float32)
    # mask_number <= 0 -> deterministic default masks in both implementations
    ours_f = wa.make_fence_distortion({"mask_number": 0, "max_db": -30})
    ref_f = ref_wd.make_fence_distortion({"mask_number": 0, "max_db": -30})
    np.testing.assert_allclose(ours_f(xs), _apply_scalar(ref_f, xs),
                               rtol=1e-5, atol=1e-6)
    ours_j = wa.make_jag_distortion({"mask_number": 0})
    ref_j = ref_wd.make_jag_distortion({"mask_number": 0})
    np.testing.assert_allclose(ours_j(xs), _apply_scalar(ref_j, xs),
                               rtol=1e-5, atol=1e-6)


def test_distort_rate_and_dispatch(rng):
    x = rng.uniform(-1, 1, 4000).astype(np.float32)
    y = wa.distort_wav_conf(x, "quad_distortion", None, rate=0.5,
                            rng=np.random.default_rng(0))
    changed = np.mean(y != x)
    assert 0.3 < changed < 0.7  # ~rate of samples touched
    assert np.array_equal(wa.distort_wav_conf(x, "none_distortion", None), x)
    with pytest.raises(ValueError, match="unsupported"):
        wa.distort_wav_conf(x, "nope", None)


def test_additive_noise_snr(rng):
    sr = 8000
    clean = (0.3 * np.sin(2 * np.pi * 220 * np.arange(2 * sr) / sr)).astype(np.float32)
    noise = rng.standard_normal(sr).astype(np.float32) * 0.1

    aug = wa.AugmentWav(noise_source=lambda cat, n: [noise] * n,
                        rir_source=lambda: np.zeros(8, np.float32),
                        rng=np.random.default_rng(3))
    out = aug.additive_noise("noise", clean)
    assert out.shape == clean.shape
    added = out - clean
    clean_db = 10 * np.log10(np.mean(clean**2) + 1e-4)
    noise_db = 10 * np.log10(np.mean(added**2) + 1e-4)
    # configured noise SNR range [0, 10]
    assert -1.0 < clean_db - noise_db < 11.0


def test_reverb_delta_rir_is_identity(rng):
    x = rng.standard_normal(1000).astype(np.float32)
    delta = np.zeros(16, np.float32)
    delta[0] = 1.0
    aug = wa.AugmentWav(noise_source=lambda c, n: [], rir_source=lambda: delta,
                        rng=np.random.default_rng(0))
    y = aug.reverberate(x)
    np.testing.assert_allclose(y, x, rtol=1e-4, atol=1e-5)


def test_pipeline_distortion_stage(tmp_path, rng):
    """wav_distortion wired into asr_data_pipeline touches waveforms."""
    from f5e_tts_tpu.data import asr_dataset as ad

    samples = [{"key": f"u{i}",
                "wav": rng.uniform(-0.5, 0.5, 800).astype(np.float32),
                "sample_rate": 16000, "txt": "ab"} for i in range(6)]
    out = list(ad.wav_distortion(iter([dict(s) for s in samples]),
                                 distort_type="quad_distortion", prob=1.0,
                                 rate=0.9, rng=__import__("random").Random(0)))
    assert len(out) == 6
    changed = sum(not np.array_equal(o["wav"], s["wav"])
                  for o, s in zip(out, samples))
    assert changed == 6
