"""Raw-socket streaming TTS server.

reference: src/f5_tts/socket_server.py:72-215 — TCP server; each connection
sends UTF-8 text, receives float32 PCM chunks followed by a b"END" sentinel.
The model warms up (compiles the bucket set) at startup, so first-request
latency is serving latency, not XLA compile latency.
"""

from __future__ import annotations

import argparse
import queue
import socket
import threading
import traceback
from typing import Optional

import numpy as np


class AudioFileWriterThread(threading.Thread):
    """Background wav writer (reference: socket_server.py:32-69)."""

    def __init__(self, output_file: str, sample_rate: int):
        super().__init__(daemon=True)
        self.output_file = output_file
        self.sample_rate = sample_rate
        self.queue: "queue.Queue[Optional[np.ndarray]]" = queue.Queue()
        self.chunks = []

    def run(self):
        while True:
            item = self.queue.get()
            if item is None:
                break
            self.chunks.append(item)
        if self.chunks and self.output_file:
            from f5e_tts_tpu.infer.audio import write_wav

            write_wav(self.output_file, np.concatenate(self.chunks), self.sample_rate)

    def add_chunk(self, chunk: np.ndarray):
        self.queue.put(chunk)

    def stop(self):
        self.queue.put(None)
        self.join()


class TTSStreamingProcessor:
    """Holds the engine + ref audio; streams PCM chunks per request.

    reference: socket_server.py:72-178 (init + warm-up + generate_stream).
    """

    def __init__(self, engine, ref_audio: np.ndarray, ref_sr: int, ref_text: str,
                 chunk_size: int = 2048, nfe_steps: Optional[int] = None,
                 warm_up: bool = True, wire: str = "f32",
                 timesteps: Optional[tuple] = None,
                 cfg_strength: Optional[float] = None):
        # wire="pcm16": stream int16 PCM frames (half the bytes) instead of
        # the reference protocol's float32 (socket_server.py:138-178). Opt-in;
        # f32 stays the default for client protocol parity.
        assert wire in ("f32", "pcm16"), wire
        self.wire = wire
        self.engine = engine
        self.ref_audio = ref_audio
        self.ref_sr = ref_sr
        self.ref_text = ref_text
        self.chunk_size = chunk_size
        # EPSS pruned grid / guidance override (0 = CFG-distilled serving);
        # the grid subsumes nfe
        self.timesteps = tuple(timesteps) if timesteps is not None else None
        self.cfg_strength = cfg_strength
        if self.timesteps is not None:
            nfe_steps = len(self.timesteps) - 1
        self.nfe_steps = nfe_steps
        if warm_up:
            self._warm_up()

    def _warm_up(self):
        """Compile the whole duration-bucket ladder before serving
        (socket_server.py:122-136 warms one shape; the AOT ladder means no
        request length ever hits a cold compile)."""
        import jax.numpy as jnp

        from f5e_tts_tpu.ops.mel import mel_spectrogram
        from f5e_tts_tpu.serving.http_server import warm_up_buckets

        import numpy as np

        from f5e_tts_tpu.infer.audio import resample

        wav = resample(np.asarray(self.ref_audio, np.float32), self.ref_sr,
                       self.engine.mel.target_sample_rate)
        ref_mel = np.asarray(mel_spectrogram(jnp.asarray(wav[None]), self.engine.mel))
        warm_up_buckets(self.engine, ref_mel, self.ref_text or "warm up.",
                        self.nfe_steps or self.engine.infer_cfg.nfe_steps,
                        timesteps=self.timesteps, cfg_strength=self.cfg_strength)

    def generate_stream(self, text: str, send):
        """Synthesize `text`, calling send(bytes) per float32 chunk + END.

        No cross-connection lock: concurrent connections coalesce in the
        engine's DynamicBatcher when one is attached."""
        stream = self.engine.infer(self.ref_audio, self.ref_sr, self.ref_text,
                                   text, nfe_steps=self.nfe_steps, streaming=True,
                                   timesteps=self.timesteps,
                                   cfg_strength=self.cfg_strength,
                                   chunk_size=self.chunk_size)
        for chunk, _sr in stream:
            if len(chunk):
                if self.wire == "pcm16":
                    from f5e_tts_tpu.native import f32_to_pcm16_bytes

                    send(f32_to_pcm16_bytes(np.asarray(chunk, np.float32)))
                else:
                    send(np.asarray(chunk, np.float32).tobytes())
        send(b"END")


def handle_client(conn: socket.socket, processor: TTSStreamingProcessor):
    try:
        with conn:
            while True:
                data = conn.recv(1024)
                if not data:
                    break
                text = data.decode("utf-8").strip()
                if not text:
                    continue
                processor.generate_stream(text, conn.sendall)
    except Exception:
        traceback.print_exc()


def serve(processor: TTSStreamingProcessor, host: str = "0.0.0.0", port: int = 9998):
    """reference: socket_server.py:203-215."""
    with socket.socket(socket.AF_INET, socket.SOCK_STREAM) as srv:
        srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        srv.bind((host, port))
        srv.listen(5)
        print(f"listening on {host}:{port}")
        while True:
            conn, addr = srv.accept()
            threading.Thread(target=handle_client, args=(conn, processor), daemon=True).start()


def main(argv=None):
    from f5e_tts_tpu.api import F5TTS
    from f5e_tts_tpu.infer.audio import read_wav

    p = argparse.ArgumentParser()
    p.add_argument("--host", default="0.0.0.0")
    p.add_argument("--port", type=int, default=9998)
    p.add_argument("--model", default="F5TTS_v1_Base")
    p.add_argument("--ckpt_file", default="")
    p.add_argument("--vocab_file", default="")
    p.add_argument("--vocoder_local_path", default=None)
    p.add_argument("--ref_audio", required=True)
    p.add_argument("--ref_text", default="")
    p.add_argument("--nfe_step", type=int, default=32)
    p.add_argument("--engine_dir", default=None,
                   help="jax.export engine files (utils/aot.py) — buckets found "
                        "here load instead of JIT-compiling at startup")
    p.add_argument("--max_batch", type=int, default=4,
                   help="dynamic-batching max batch (0 disables the batcher); "
                        "concurrent connections co-batch like the reference's "
                        "Triton ingress (config.pbtxt:15-18)")
    p.add_argument("--batch_window_ms", type=float, default=20.0)
    p.add_argument("--wire", choices=["f32", "pcm16"], default="f32",
                   help="pcm16: stream int16 PCM (half the bytes per chunk); "
                        "f32 matches the reference client protocol")
    p.add_argument("--wire_device", choices=["float32", "int16"], default="float32",
                   help="int16: quantize the wav to pcm16 ON DEVICE in the "
                        "batcher so the device->host fetch is halved too")
    p.add_argument("--xfer_chunks", type=int, default=1,
                   help=">1: fetch the batch's wavs in row chunks so early "
                        "requests resolve before the whole batch has "
                        "crossed the device link")
    p.add_argument("--prune", default=None,
                   help="EPSS keep indices into the --nfe_step sway grid "
                        "(comma-separated); bakes the pruned ODE schedule")
    p.add_argument("--cfg", type=float, default=None,
                   help="cfg_strength override; 0 = CFG-distilled "
                        "single-pass serving (train/distill.py)")
    p.add_argument("--compilation_cache", default="",
                   help="persistent XLA compile-cache dir (cold-start reuse)")
    args = p.parse_args(argv)
    if args.compilation_cache:
        from f5e_tts_tpu.serving.http_server import enable_compilation_cache

        enable_compilation_cache(args.compilation_cache)

    tts = F5TTS(model=args.model, ckpt_file=args.ckpt_file, vocab_file=args.vocab_file,
                vocoder_local_path=args.vocoder_local_path,
                engine_dir=args.engine_dir)
    wav, sr = read_wav(args.ref_audio)
    grid = None
    if args.prune:
        from f5e_tts_tpu.models.cfm import pruned_sway_timesteps

        grid = pruned_sway_timesteps([int(i) for i in args.prune.split(",")],
                                     base_steps=args.nfe_step)
    if args.max_batch > 0:
        # attach before warm-up so the (max_batch, bucket) shapes compile
        tts.engine.enable_batching(max_batch=args.max_batch,
                                   window_ms=args.batch_window_ms,
                                   nfe_steps=args.nfe_step,
                                   return_mel=False,
                                   wire_dtype=args.wire_device,
                                   xfer_chunks=args.xfer_chunks,
                                   timesteps=grid, cfg_strength=args.cfg)
    processor = TTSStreamingProcessor(tts.engine, wav, sr, args.ref_text,
                                      nfe_steps=args.nfe_step, wire=args.wire,
                                      timesteps=grid, cfg_strength=args.cfg)
    serve(processor, args.host, args.port)


if __name__ == "__main__":
    main()
