"""HTTP JSON/wav TTS endpoint (stdlib http.server; Triton-client parity).

reference: the Triton python-backend + HTTP client pair
(src/f5_tts/runtime/triton_trtllm/model_repo_f5_tts/f5_tts/1/model.py +
client_http.py). Here the "engine" is the AOT-warmed jitted sampler; requests
POST JSON {"text": ..., ["nfe": N]} and receive a 16-bit PCM wav body.

The warm-up pre-compiles the whole duration-bucket ladder so any request
length is compile-free (the TRT engine achieves this with one max-shape
engine; buckets avoid the wasted FLOPs).
"""

from __future__ import annotations

import argparse
import io
import json
import wave
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np


def wav_bytes(wav: np.ndarray, sr: int) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(sr)
        f.writeframes((np.clip(wav, -1, 1) * 32767).astype(np.int16).tobytes())
    return buf.getvalue()


def warm_up_buckets(engine, ref_mel: np.ndarray, ref_text: str, nfe: int,
                    buckets=None, timesteps=None, cfg_strength=None):
    """Compile the sampler for every duration bucket (AOT ladder).

    When a DynamicBatcher is attached the (max_batch, bucket) shapes it
    serves with are warmed through it; otherwise the direct batch-1 path."""
    buckets = buckets or engine.buckets
    ref_frames = ref_mel.shape[1]
    for bucket in buckets:
        if bucket <= ref_frames:
            continue
        duration = min(bucket, engine.infer_cfg.max_duration)
        if engine.batcher is not None and nfe == engine.batcher.nfe:
            ids = engine.tokenize([ref_text + " warm up."])[0]
            ids = np.asarray(ids[ids >= 0])
            # warm every power-of-two sampler batch the batcher can emit
            # (1, 2, ..., max_batch): submit k requests at once per size
            k = 1
            while True:
                futs = [engine.batcher.submit(ref_mel[0], ids, duration, seed=0)
                        for _ in range(k)]
                for f in futs:
                    f.result()
                if k >= engine.batcher.max_batch:
                    break
                k *= 2
        else:
            engine.synthesize_chunk(ref_mel, ref_text + " warm up.", duration,
                                    nfe_steps=nfe, timesteps=timesteps,
                                    cfg_strength=cfg_strength, seed=0)


def enable_compilation_cache(path: str) -> None:
    """Persistent XLA compilation cache: server restarts reuse lowered
    binaries instead of recompiling the bucket ladder (pairs with the
    jax.export engine files, which skip tracing too)."""
    import jax

    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


class TTSHandler(BaseHTTPRequestHandler):
    """Handlers run concurrently (ThreadingHTTPServer); no global lock —
    concurrent /tts requests coalesce in the engine's DynamicBatcher when one
    is attached (Triton dynamic_batching equivalent)."""

    engine = None
    ref_audio = None
    ref_sr = None
    ref_text = ""
    nfe = 32
    timesteps = None      # EPSS pruned grid baked at serve() time
    cfg_strength = None   # non-default guidance (0 = distilled serving)

    def log_message(self, fmt, *args):  # quiet
        pass

    def do_GET(self):
        if self.path == "/health":
            self.send_response(200)
            self.end_headers()
            self.wfile.write(b"ok")
        else:
            self.send_response(404)
            self.end_headers()

    def do_POST(self):
        if self.path != "/tts":
            self.send_response(404)
            self.end_headers()
            return
        try:
            length = int(self.headers.get("Content-Length", 0))
            req = json.loads(self.rfile.read(length) or b"{}")
            text = req["text"]
            nfe = int(req.get("nfe", self.nfe))
            out, sr, _ = self.engine.infer(
                self.ref_audio, self.ref_sr, self.ref_text, text, nfe_steps=nfe,
                timesteps=self.timesteps, cfg_strength=self.cfg_strength,
                seed=int(req.get("seed", 0)))
            body = wav_bytes(out, sr)
            self.send_response(200)
            self.send_header("Content-Type", "audio/wav")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)
        except Exception as e:  # noqa: BLE001
            msg = json.dumps({"error": str(e)}).encode()
            self.send_response(500)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(msg)))
            self.end_headers()
            self.wfile.write(msg)


def serve(engine, ref_audio, ref_sr, ref_text, host="0.0.0.0", port=8000, nfe=32,
          warm=True, max_batch: int = 4, batch_window_ms: float = 20.0,
          wire_device: str = "float32", xfer_chunks: int = 1,
          timesteps=None, cfg_strength=None):
    if timesteps is not None:
        nfe = len(timesteps) - 1  # the grid subsumes nfe
    if max_batch > 0 and engine.batcher is None:
        engine.enable_batching(max_batch=max_batch, window_ms=batch_window_ms,
                               nfe_steps=nfe, return_mel=False,
                               wire_dtype=wire_device, xfer_chunks=xfer_chunks,
                               timesteps=timesteps, cfg_strength=cfg_strength)
    if warm:
        import jax.numpy as jnp

        from f5e_tts_tpu.ops.mel import mel_spectrogram

        ref_mel = np.asarray(mel_spectrogram(jnp.asarray(ref_audio[None]), engine.mel))
        warm_up_buckets(engine, ref_mel, ref_text, nfe,
                        timesteps=timesteps, cfg_strength=cfg_strength)
    TTSHandler.engine = engine
    TTSHandler.ref_audio = ref_audio
    TTSHandler.ref_sr = ref_sr
    TTSHandler.ref_text = ref_text
    TTSHandler.nfe = nfe
    TTSHandler.timesteps = tuple(timesteps) if timesteps is not None else None
    TTSHandler.cfg_strength = cfg_strength
    srv = ThreadingHTTPServer((host, port), TTSHandler)
    print(f"HTTP TTS on {host}:{port} (POST /tts)")
    srv.serve_forever()


def main(argv=None):
    from f5e_tts_tpu.api import F5TTS
    from f5e_tts_tpu.infer.audio import read_wav

    p = argparse.ArgumentParser()
    p.add_argument("--host", default="0.0.0.0")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--model", default="F5TTS_v1_Base")
    p.add_argument("--ckpt_file", default="")
    p.add_argument("--vocab_file", default="")
    p.add_argument("--vocoder_local_path", default=None)
    p.add_argument("--ref_audio", required=True)
    p.add_argument("--ref_text", default="")
    p.add_argument("--nfe", type=int, default=32)
    p.add_argument("--no_warm", action="store_true")
    p.add_argument("--max_batch", type=int, default=4,
                   help="dynamic-batching max batch (0 disables the batcher)")
    p.add_argument("--batch_window_ms", type=float, default=20.0)
    p.add_argument("--wire_device", choices=["float32", "int16"], default="float32",
                   help="int16: quantize the wav to pcm16 ON DEVICE in the "
                        "batcher, halving the device->host fetch bytes")
    p.add_argument("--xfer_chunks", type=int, default=1,
                   help=">1: fetch the batch's wavs in row chunks so early "
                        "requests resolve before the whole batch has "
                        "crossed the device link")
    p.add_argument("--prune", default=None,
                   help="EPSS keep indices into the --nfe sway grid "
                        "(comma-separated); bakes the pruned ODE schedule")
    p.add_argument("--cfg", type=float, default=None,
                   help="cfg_strength override; 0 = CFG-distilled "
                        "single-pass serving (train/distill.py)")
    p.add_argument("--compilation_cache", default="",
                   help="persistent XLA compile-cache dir (cold-start reuse)")
    args = p.parse_args(argv)
    if args.compilation_cache:
        enable_compilation_cache(args.compilation_cache)
    tts = F5TTS(model=args.model, ckpt_file=args.ckpt_file, vocab_file=args.vocab_file,
                vocoder_local_path=args.vocoder_local_path)
    wav, sr = read_wav(args.ref_audio)
    grid = None
    if args.prune:
        from f5e_tts_tpu.models.cfm import pruned_sway_timesteps

        grid = pruned_sway_timesteps([int(i) for i in args.prune.split(",")],
                                     base_steps=args.nfe)
    serve(tts.engine, wav, sr, args.ref_text, args.host, args.port, args.nfe,
          warm=not args.no_warm, max_batch=args.max_batch,
          batch_window_ms=args.batch_window_ms, wire_device=args.wire_device,
          xfer_chunks=args.xfer_chunks, timesteps=grid, cfg_strength=args.cfg)


if __name__ == "__main__":
    main()
