"""Dynamic request batcher: Triton `dynamic_batching` equivalent.

reference: the Triton config (model_repo_f5_tts/f5_tts/config.pbtxt:15-18,
max_batch 4 + dynamic batching) in front of the TRT-LLM engine. Here: a worker
thread collects concurrent requests for up to `window_ms`, pads them into ONE
fixed-(max_batch, bucket) sampler call (always padded to max_batch so exactly
one compiled graph per bucket serves every load level), and fans results back
out to per-request futures.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import Future
from dataclasses import dataclass
from functools import partial
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from f5e_tts_tpu.infer.pipeline import pick_bucket, slice_gen as _slice_gen
from f5e_tts_tpu.models import cfm as fcfm


@dataclass
class _Request:
    ref_mel: np.ndarray  # (ref_frames, mel)
    text_ids: np.ndarray  # (NT,)
    duration: int
    seed: int
    future: Future


class DynamicBatcher:
    def __init__(self, engine, max_batch: int = 4, window_ms: float = 20.0,
                 nfe_steps: Optional[int] = None, cfg_strength: Optional[float] = None,
                 sway: Optional[float] = None, text_pad_to: int = 64,
                 return_mel: bool = True, wire_dtype: str = "float32",
                 xfer_chunks: int = 1, timesteps: Optional[tuple] = None):
        self.engine = engine
        # wire_dtype="int16": quantize the wav to pcm16 ON DEVICE (inside the
        # fused slice+vocode dispatch) so the device->host fetch moves half
        # the bytes — the fetch dominates end-to-end RTF through a tunneled
        # device. Futures still resolve float32 wavs (converted on host);
        # default stays float32 for bit-parity with the direct path.
        assert wire_dtype in ("float32", "int16"), wire_dtype
        self.wire_dtype = wire_dtype
        # xfer_chunks > 1 (wav-only config): fetch the batch's wavs in that
        # many row chunks so early requests resolve while later rows are
        # still crossing the device link (see _finish_on_device)
        self.xfer_chunks = xfer_chunks
        self.max_batch = max_batch
        self.window_s = window_ms / 1000.0
        icfg = engine.infer_cfg
        self.nfe = nfe_steps if nfe_steps is not None else icfg.nfe_steps
        self.cfg_strength = cfg_strength if cfg_strength is not None else icfg.cfg_strength
        self.sway = sway if sway is not None else icfg.sway_sampling_coef
        # optional explicit ODE grid (EPSS pruned schedule); baked into the
        # compiled sampler like nfe/cfg/sway — requests with a different grid
        # fall back to the direct path (pipeline.infer's use_batcher check)
        self.timesteps = tuple(timesteps) if timesteps is not None else None
        if self.timesteps is not None:
            self.nfe = len(self.timesteps) - 1
        self.text_pad_to = text_pad_to
        # servers that only ship wav can skip the generated-mel fetch
        # entirely (return_mel=False -> futures resolve (wav, None))
        self.return_mel = return_mel
        self.queue: "queue.Queue[_Request]" = queue.Queue()
        self._stop = False
        # observability: size of every processed batch (tests + benchmark
        # assert co-batching actually happens under concurrency)
        self.batch_sizes: List[int] = []
        # per-batch stage timeline (seconds): sampler device time, mel
        # device→host transfer, vocoder device time, wav device→host transfer,
        # host pack/slice work. The benchmark uses this to report RTF
        # net-of-transfer (transfer = tunnel/PCIe cost that Triton's
        # on-box clients don't pay the same way).
        self.stage_times: List[dict] = []
        # two-stage pipeline (Triton decoupled-backend equivalent): the worker
        # thread only collects + launches the sampler (async dispatch returns
        # before the TPU finishes); the finisher thread blocks on the result,
        # runs the vocoder, and resolves futures. The next batch's sampler
        # overlaps the previous batch's vocoder + host work (~28% of the
        # per-batch wall at NFE 16 on chip). maxsize bounds device-queue depth.
        self.finish_queue: "queue.Queue" = queue.Queue(maxsize=2)
        self.worker = threading.Thread(target=self._run, daemon=True)
        self.worker.start()
        self.finisher = threading.Thread(target=self._finish_loop, daemon=True)
        self.finisher.start()

    def submit(self, ref_mel: np.ndarray, text_ids: np.ndarray, duration: int,
               seed: int = 0) -> Future:
        fut: Future = Future()
        self.queue.put(_Request(ref_mel, text_ids, duration, seed, fut))
        return fut

    def stop(self):
        self._stop = True
        self.finish_queue.put(None)

    # ------------------------------------------------------------------

    def _collect(self) -> List[_Request]:
        try:
            first = self.queue.get(timeout=0.25)
        except queue.Empty:
            return []
        batch = [first]
        deadline = self.window_s
        import time

        t0 = time.perf_counter()
        while len(batch) < self.max_batch:
            remaining = deadline - (time.perf_counter() - t0)
            if remaining <= 0:
                break
            try:
                batch.append(self.queue.get(timeout=remaining))
            except queue.Empty:
                break
        return batch

    def _run(self):
        while not self._stop:
            batch = self._collect()
            if not batch:
                continue
            try:
                self._process(batch)
            except Exception as e:  # noqa: BLE001
                for r in batch:
                    if not r.future.done():
                        r.future.set_exception(e)

    def _finish_loop(self):
        while True:
            item = self.finish_queue.get()
            if item is None:  # stop sentinel
                return
            batch, out, lens, durations, t_launch = item
            try:
                self._finish(batch, out, lens, durations, t_launch)
            except Exception as e:  # noqa: BLE001
                for r in batch:
                    if not r.future.done():
                        r.future.set_exception(e)

    def _process(self, batch: List[_Request]):
        self.batch_sizes.append(len(batch))
        eng = self.engine
        mel_dim = eng.mel.n_mel_channels
        # next power of two >= len(batch): a lone request costs single-sample
        # compute instead of always paying max_batch (round-2 fix — the fixed
        # max_batch pad made bs=1 latency ~max_batch x the direct path), while
        # compiles stay bounded at log2(max_batch)+1 shapes per bucket.
        b = 1
        while b < len(batch):
            b *= 2
        b = min(b, self.max_batch)
        bucket = pick_bucket(max(r.duration for r in batch), eng.buckets)
        nt = -(-max(len(r.text_ids) for r in batch) // self.text_pad_to) * self.text_pad_to

        conds = np.zeros((b, bucket, mel_dim), np.float32)
        lens = np.ones((b,), np.int32)
        durations = np.full((b,), 2, np.int32)
        ids = np.full((b, nt), -1, np.int32)
        seeds = np.zeros((b,), np.int32)
        for i, r in enumerate(batch):
            rf = min(r.ref_mel.shape[0], bucket)
            conds[i, :rf] = r.ref_mel[:rf]
            lens[i] = rf
            durations[i] = min(max(r.duration, rf + 1, len(r.text_ids) + 1), bucket)
            ids[i, : min(len(r.text_ids), nt)] = r.text_ids[:nt]
            seeds[i] = np.int64(r.seed) & 0x7FFFFFFF

        inputs = fcfm.prepare_inputs(jnp.asarray(conds), jnp.asarray(lens),
                                     jnp.asarray(durations), bucket,
                                     text_ids=jnp.asarray(ids))
        # per-request seeds: each slot's noise depends only on its own seed,
        # so output is reproducible regardless of co-batching (fixes the
        # batch[0].seed + slot-index coupling flagged in round-1 review).
        out, _ = fcfm.sample(eng.params, eng.state, eng.arch, eng.cfm, inputs,
                             jax.random.PRNGKey(0), steps=self.nfe,
                             cfg_strength=self.cfg_strength, sway_coef=self.sway,
                             use_mask=True, seeds=jnp.asarray(seeds),
                             timesteps=self.timesteps,
                             compute_dtype=eng.compute_dtype)
        # hand the (still in-flight) device array to the finisher; collect the
        # next batch while the TPU computes and the vocoder/host work drains
        import time

        self.finish_queue.put((batch, out, lens, durations, time.perf_counter()))

    def _finish(self, batch: List[_Request], out, lens, durations,
                t_launch: float = 0.0):
        import time

        eng = self.engine
        mel_dim = eng.mel.n_mel_channels
        dev_decode = getattr(eng.vocoder_decode, "device", None)
        if dev_decode is not None:
            return self._finish_on_device(batch, out, lens, durations,
                                          t_launch, dev_decode)
        jax.block_until_ready(out)
        t_ready = time.perf_counter()
        out = np.asarray(out, np.float32)
        t_mel = time.perf_counter()
        # one vocoder call for the whole batch at a common ladder length
        # (engine.decode_mel pads with the silence floor and we trim per
        # request) — generated lengths are data-dependent, so per-request
        # exact-shape decodes would recompile the vocoder per utterance.
        mel_gens = [out[i, int(lens[i]) : int(durations[i])] for i in range(len(batch))]
        lmax = max(m.shape[0] for m in mel_gens)
        floor = float(np.log(1e-5))
        stacked = np.full((len(batch), lmax, mel_dim), floor, np.float32)
        for i, m in enumerate(mel_gens):
            stacked[i, : m.shape[0]] = m
        t_pack = time.perf_counter()
        wav_dev, trim = eng.decode_mel(stacked, device_out=True)
        jax.block_until_ready(wav_dev)
        t_voc = time.perf_counter()
        wavs = np.asarray(wav_dev)[:, :trim]
        t_wav = time.perf_counter()
        hop = eng.mel.hop_length
        for i, r in enumerate(batch):
            r.future.set_result((wavs[i, : mel_gens[i].shape[0] * hop], mel_gens[i]))
        self.stage_times.append({
            "fold": len(batch),
            "sampler_s": t_ready - t_launch,
            "mel_xfer_s": t_mel - t_ready,
            "host_s": t_pack - t_mel,
            "vocode_s": t_voc - t_pack,
            "wav_xfer_s": t_wav - t_voc,
        })

    def _finish_on_device(self, batch: List[_Request], out, lens, durations,
                          t_launch: float, dev_decode):
        """Device-resident finish: slice/mask the generated region and vocode
        WITHOUT pulling the padded mel to host first (saves ~2x the generated
        mel bytes of device-link traffic per batch vs _finish's
        fetch -> host pack -> re-upload)."""
        import time

        eng = self.engine
        jax.block_until_ready(out)
        t_ready = time.perf_counter()

        # min-1 only for shape safety in the device slice; results are trimmed
        # to the true generated length below so a degenerate request returns
        # an EMPTY wav/mel exactly like the host _finish path
        true_gen = np.maximum(durations - lens, 0).astype(np.int32)
        gen = np.maximum(true_gen, 1)
        pad = eng.vocoder_pad_to or 1
        lmax = int(gen.max())
        L = max(-(-lmax // pad) * pad, pad)
        i16 = (getattr(eng.vocoder_decode, "device_sliced_i16", None)
               if self.wire_dtype == "int16" else None)
        fused = i16 or getattr(eng.vocoder_decode, "device_sliced", None)
        if fused is not None:
            # one dispatch: slice+mask+vocode (+pcm16 quant) in one graph
            wav_dev, mel_dev = fused(out, jnp.asarray(lens), jnp.asarray(gen), L)
        else:
            mel_dev = _slice_gen(out, jnp.asarray(lens), jnp.asarray(gen), L)
            wav_dev = dev_decode(mel_dev)
        jax.block_until_ready(wav_dev)
        t_voc = time.perf_counter()

        hop = eng.mel.hop_length

        def to_f32(a):
            return (a.astype(np.float32) / 32767.0 if a.dtype == np.int16
                    else a.astype(np.float32))

        if self.xfer_chunks > 1 and not self.return_mel and len(batch) > 1:
            # chunked fetch (wav-only config): requests in earlier row chunks
            # resolve while later chunks are still crossing the device link —
            # with int16 wire an early request waits ~1/(2*chunks) of the
            # round-3 full-batch f32 fetch. Slices use static python bounds,
            # so executables stay bounded per (batch, bucket) shape.
            bounds = np.linspace(0, len(batch), self.xfer_chunks + 1).astype(int)
            for lo, hi in zip(bounds[:-1], bounds[1:]):
                if lo == hi:
                    continue
                part = to_f32(np.asarray(wav_dev[int(lo):int(hi)]))
                for j in range(int(lo), int(hi)):
                    batch[j].future.set_result(
                        (part[j - int(lo), : true_gen[j] * hop], None))
            t_wav = t_mel = time.perf_counter()
            self.stage_times.append({
                "fold": len(batch),
                "sampler_s": t_ready - t_launch,
                "mel_xfer_s": 0.0,
                "host_s": time.perf_counter() - t_mel,
                "vocode_s": t_voc - t_ready,
                "wav_xfer_s": t_wav - t_voc,
            })
            return

        wavs = to_f32(np.asarray(wav_dev))
        t_wav = time.perf_counter()
        mels = np.asarray(mel_dev, np.float32) if self.return_mel else None
        t_mel = time.perf_counter()

        for i, r in enumerate(batch):
            mel_i = mels[i, : true_gen[i]] if mels is not None else None
            r.future.set_result((wavs[i, : true_gen[i] * hop], mel_i))
        self.stage_times.append({
            "fold": len(batch),
            "sampler_s": t_ready - t_launch,
            "mel_xfer_s": t_mel - t_wav,
            "host_s": time.perf_counter() - t_mel,
            "vocode_s": t_voc - t_ready,
            "wav_xfer_s": t_wav - t_voc,
        })
