"""Socket client: sends text, receives float32 PCM chunks, measures first-chunk
latency. reference: src/f5_tts/socket_client.py:14-63 (async pyaudio playback
replaced by file capture — no audio device in this environment)."""

from __future__ import annotations

import argparse
import socket
import time

import numpy as np


def request(host: str, port: int, text: str, timeout: float = 120.0):
    """Send one text request; return (waveform float32, first_chunk_latency_s)."""
    chunks = []
    t0 = time.perf_counter()
    first_latency = None
    buf = b""
    with socket.create_connection((host, port), timeout=timeout) as sock:
        sock.sendall(text.encode("utf-8"))
        while True:
            data = sock.recv(65536)
            if not data:
                break
            buf += data
            if first_latency is None:
                first_latency = time.perf_counter() - t0
            if buf.endswith(b"END"):
                buf = buf[:-3]
                break
    if buf:
        chunks.append(np.frombuffer(buf, dtype=np.float32))
    wav = np.concatenate(chunks) if chunks else np.zeros(0, np.float32)
    return wav, first_latency


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=9998)
    p.add_argument("--text", required=True)
    p.add_argument("--output", default="client_out.wav")
    p.add_argument("--sample_rate", type=int, default=24000)
    args = p.parse_args(argv)

    wav, latency = request(args.host, args.port, args.text)
    print(f"received {len(wav) / args.sample_rate:.2f}s audio, "
          f"first-chunk latency {latency * 1e3:.0f} ms")
    if len(wav):
        from f5e_tts_tpu.infer.audio import write_wav

        write_wav(args.output, wav, args.sample_rate)
        print(f"wrote {args.output}")


if __name__ == "__main__":
    main()
