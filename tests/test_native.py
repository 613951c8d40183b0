"""Native C++ host runtime tests (builds the .so; compares to python paths)."""

import numpy as np
import pytest

from f5e_tts_tpu import native as fnat

pytestmark = pytest.mark.core


@pytest.fixture(scope="module")
def lib():
    lib = fnat.load_library()
    if lib is None:
        pytest.skip("native library unavailable (no toolchain)")
    return lib


def test_pcm_roundtrip(lib, rng):
    x = (rng.standard_normal(1000) * 0.5).astype(np.float32)
    data = fnat.f32_to_pcm16_bytes(x)
    y = fnat.pcm16_bytes_to_f32(data)
    np.testing.assert_allclose(y, np.clip(x, -1, 1), atol=1.5e-4)


def test_native_resample_matches_scipy(lib):
    t = np.arange(16000) / 16000
    x = np.sin(2 * np.pi * 440 * t).astype(np.float32)
    ours = fnat.resample(x, 16000, 24000)
    from f5e_tts_tpu.infer.audio import resample as py_resample

    ref = py_resample(x, 16000, 24000)
    n = min(len(ours), len(ref))
    # interior agreement (edge transients differ by window choice)
    sl = slice(1000, n - 1000)
    err = np.abs(ours[sl] - ref[sl]).max()
    assert err < 5e-3, err


def test_native_crossfade_matches_python(lib, rng):
    from f5e_tts_tpu.infer.pipeline import cross_fade_stitch as py_stitch

    waves = [rng.standard_normal(500).astype(np.float32) for _ in range(3)]
    ours = fnat.crossfade_stitch(waves, sr=100, cross_fade_duration=0.5)
    ref = py_stitch(waves, 100, 0.5)
    assert len(ours) == len(ref)
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_stale_so_rebuilds_on_source_change(lib, tmp_path, monkeypatch):
    """A leftover .so must not shadow an edited f5e_host.cpp (VERDICT r4 #9)."""
    import shutil

    src = fnat._native_dir()
    d = tmp_path / "native"
    shutil.copytree(src, d, ignore=shutil.ignore_patterns("*.so*"))
    monkeypatch.setattr(fnat, "_native_dir", lambda: str(d))
    monkeypatch.setattr(fnat, "_LIB", None)
    monkeypatch.setattr(fnat, "_TRIED", False)
    assert fnat.load_library() is not None  # fresh build
    so = d / "libf5e_host.so"
    first_stat = so.stat()
    first_hash = (d / "libf5e_host.so.srchash").read_text()

    # unchanged source -> no rebuild
    monkeypatch.setattr(fnat, "_LIB", None)
    monkeypatch.setattr(fnat, "_TRIED", False)
    assert fnat.load_library() is not None
    assert so.stat().st_mtime_ns == first_stat.st_mtime_ns

    # edited source -> rebuild + hash refresh
    cpp = d / "f5e_host.cpp"
    cpp.write_text(cpp.read_text() + "\n// edited\n")
    monkeypatch.setattr(fnat, "_LIB", None)
    monkeypatch.setattr(fnat, "_TRIED", False)
    assert fnat.load_library() is not None
    assert (d / "libf5e_host.so.srchash").read_text() != first_hash
    assert so.stat().st_mtime_ns != first_stat.st_mtime_ns


def test_native_pack_matches_python(lib, rng):
    from f5e_tts_tpu.data.dataset import pack_batches as py_pack

    lens = rng.integers(10, 400, 200).astype(np.int32).tolist()
    ours = fnat.pack_batches(lens, frames_threshold=1000, max_samples=8,
                             min_frames=20, max_frames=350)
    ref = py_pack(lens, frames_threshold=1000, max_samples=8,
                  min_frames=20, max_frames=350)
    assert [sorted(b) for b in ours] == [sorted(b) for b in ref]
