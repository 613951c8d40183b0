"""Training loop: data -> sharded jitted step -> EMA -> checkpoints -> logs.

reference: src/f5_tts/model/trainer.py:25-494. Key re-designs:

- Accelerate/NCCL DDP becomes a (data, model, seq) mesh + NamedShardings; the
  gradient all-reduce is GSPMD-inserted (trainer.py:63-68 -> parallel/mesh.py),
- the log-mel frontend runs on device INSIDE the jitted step (one rFFT + MXU
  matmul) instead of in 16 CPU dataloader workers (trainer.py:283-310),
- EMA/grad-clip/NaN-skip live inside the compiled step (train/step.py),
- checkpoints: orbax for full train state (params/EMA/opt/update), plus a
  torch-layout safetensors EMA export for ecosystem interop (the reference's
  .pt dict {model_state_dict, ema_model_state_dict, update} semantics,
  trainer.py:150-163); rotation keeps last N, never deletes pretrained_*
  (trainer.py:166-183); resume prefers model_last (trainer.py:185-263).
"""

from __future__ import annotations

import json
import os
import re
import time
from dataclasses import dataclass
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from f5e_tts_tpu.config import MelConfig, ModelConfig, TrainConfig
from f5e_tts_tpu.models import backbone as fbb
from f5e_tts_tpu.models import cfm as fcfm
from f5e_tts_tpu.ops.mel import mel_spectrogram
from f5e_tts_tpu.parallel import make_mesh
from f5e_tts_tpu.parallel.mesh import dit_param_spec, tree_map_with_spec
from f5e_tts_tpu.train import step as fstep


def make_sample_logger(model_cfg: ModelConfig, vocab, tokenizer: str, save_dir: str,
                       sample_text: str, ref_mel: "np.ndarray", ref_text: str,
                       vocoder_decode=None, nfe: int = 32):
    """Periodic audio sample logging hook (reference: trainer.py:434-490 —
    runs inference on a fixed prompt every log_samples_per_updates, writes
    update_N_gen.wav next to the checkpoints)."""
    from f5e_tts_tpu.infer.audio import write_wav
    from f5e_tts_tpu.infer.pipeline import TTSEngine

    def sample_fn(ema_params, update: int):
        import jax.numpy as jnp_

        params = jax.tree.map(jnp.asarray, ema_params)
        engine = TTSEngine(
            params=params, state={}, arch=model_cfg.arch, vocab=vocab,
            mel=model_cfg.mel, cfm=model_cfg.cfm, infer_cfg=model_cfg.infer,
            tokenizer=tokenizer, vocoder_decode=vocoder_decode,
            compute_dtype=jnp_.float32)
        ref_frames = ref_mel.shape[0]
        duration = ref_frames * 2
        mel_gen = engine.synthesize_chunk(ref_mel[None], ref_text + " " + sample_text,
                                          duration, seed=update, nfe_steps=nfe)
        if vocoder_decode is not None:
            wav = np.asarray(vocoder_decode(jnp.asarray(mel_gen[None])))[0]
            write_wav(os.path.join(save_dir, f"update_{update}_gen.wav"), wav,
                      model_cfg.mel.target_sample_rate)
        np.save(os.path.join(save_dir, f"update_{update}_gen_mel.npy"), mel_gen)

    return sample_fn


def loss_with_device_mel(params, model_state, arch, cfm, mel_cfg: MelConfig,
                         batch, rng, compute_dtype):
    """cfm_loss, computing log-mel on device when the batch carries raw audio."""
    if "mel" in batch:
        mel = batch["mel"]
    else:
        n = batch["audio"].shape[1] // mel_cfg.hop_length
        mel = mel_spectrogram(batch["audio"], mel_cfg)[:, :n, :]
    return fcfm.cfm_loss(
        params, model_state, arch, cfm,
        mel=mel, mel_lens=batch["mel_lens"],
        text_ids=batch.get("text_ids"), text_lens=batch.get("text_lens"),
        ppg=batch.get("ppg"), ppg_lens=batch.get("ppg_lens"),
        rng=rng, training=True, compute_dtype=compute_dtype,
    )


@dataclass
class Trainer:
    model_cfg: ModelConfig
    train_cfg: TrainConfig
    vocab_size: int
    tokenize: Callable
    log_fn: Optional[Callable[[dict, int], None]] = None
    sample_fn: Optional[Callable[[dict, int], None]] = None  # periodic audio logging hook
    ppg_extractor: object = None  # frozen PPGExtractor for on-the-fly extraction
    # CFG distillation (train/distill.py, arXiv 2504.20334): when teacher
    # params are set the step trains the student against the teacher's
    # guidance-combined flow instead of the CFM target; everything else
    # (mesh, EMA, rotation, preemption, resume) is unchanged.
    teacher_params: object = None
    distill_cfg_strength: float = 2.0

    def __post_init__(self):
        if getattr(self.train_cfg, "prng_impl", "default") == "rbg":
            # TPU hardware RBG for dropout/span rngs — threefry mask bits are
            # VPU work that shows up in train-step traces; rbg is near-free.
            # Must run before any PRNGKey this trainer creates.
            jax.config.update("jax_default_prng_impl", "rbg")
        self.mesh = make_mesh(self.train_cfg.mesh)
        if self.mesh.shape.get("model", 1) > 1:
            # head-shard Pallas attention over the TP axis (ops/attention.py)
            from f5e_tts_tpu.ops.attention import set_tp_context

            set_tp_context(self.mesh)
        if self.mesh.shape.get("seq", 1) > 1:
            # long sequences route through ring attention (K/V stay sharded,
            # ppermute ring) instead of GSPMD's all-gather (ops/ring_attention)
            from f5e_tts_tpu.ops.attention import set_sp_context

            set_sp_context(self.mesh)
        if self.mesh.shape.get("pipe", 1) > 1:
            # GPipe over transformer depth (parallel/pipeline.py); requires
            # tp == 1 (asserted in dit_trunk). Only the DiT backbone
            # pipelines — fail loudly rather than silently replicating.
            assert fbb.backbone_kind(self.model_cfg.arch) == "dit", (
                "mesh.pipe > 1 is only supported for the DiT backbone "
                "(UNetT's cross-depth skips are pipeline-hostile; MMDiT "
                "keeps the sequential scan)")
            from f5e_tts_tpu.parallel.pipeline import set_pp_context

            set_pp_context(self.mesh,
                           n_micro=self.train_cfg.pp_microbatches)
        self.arch = self.model_cfg.arch
        self.cfm = self.model_cfg.cfm
        self.compute_dtype = jnp.bfloat16 if self.train_cfg.compute_dtype == "bfloat16" else jnp.float32
        os.makedirs(self.train_cfg.save_dir, exist_ok=True)

    # ------------------------------------------------------------------
    # state setup
    # ------------------------------------------------------------------

    def init_state(self, total_updates: int, rng_seed: int = 0,
                   pretrained_path: Optional[str] = None) -> fstep.TrainState:
        params, model_state = fbb.init_backbone(
            jax.random.PRNGKey(rng_seed), self.arch, self.vocab_size)
        if pretrained_path:
            from f5e_tts_tpu.utils.torch_ckpt import backbone_from_torch, load_torch_state_dict

            sd = load_torch_state_dict(pretrained_path, use_ema=True)
            params, model_state = backbone_from_torch(sd, self.arch)
            params = jax.tree.map(jnp.asarray, params)
            model_state = jax.tree.map(jnp.asarray, model_state)
        use_fsdp = self.mesh.shape.get("fsdp", 1) > 1
        use_pipe = self.mesh.shape.get("pipe", 1) > 1
        if fbb.backbone_kind(self.arch) == "dit":
            params = tree_map_with_spec(
                lambda x, s: jax.device_put(x, NamedSharding(self.mesh, s)),
                params, dit_param_spec(self.arch, fsdp=use_fsdp,
                                       pipe=use_pipe))
        else:
            params = jax.device_put(params, NamedSharding(self.mesh, P()))
        num_replicas = self.mesh.shape["data"] * self.mesh.shape.get("fsdp", 1)
        self.optimizer = fstep.make_optimizer(
            self.train_cfg, total_updates, num_replicas=num_replicas)
        ts = fstep.init_train_state(params, model_state, self.optimizer)
        # Commit every leaf to the mesh (scalar counters and eagerly-derived
        # EMA/opt leaves are otherwise uncommitted) so the first step call's
        # jit signature matches the steady state — an uncommitted-vs-committed
        # mismatch forces a second full compile of the step.
        ts = jax.tree.map(
            lambda x: jax.device_put(x, self._canonical_sharding(x)), ts)
        # cache for train(): callers arm pretrained weights via
        # init_state(pretrained_path=...) before train(), which must consume
        # THIS state rather than re-initializing from scratch
        self._init_ts = ts
        return ts

    def _canonical_sharding(self, x) -> NamedSharding:
        sh = getattr(x, "sharding", None)
        spec = sh.spec if isinstance(sh, NamedSharding) else P()
        return NamedSharding(self.mesh, spec)

    def set_teacher(self, teacher, cfg_strength: Optional[float] = None):
        """Arm distillation: teacher = torch-ckpt path or a params pytree.

        The teacher is placed with the SAME mesh spec as the student so the
        folded 2B teacher pass shards identically under dp/fsdp/pipe.
        """
        if isinstance(teacher, str):
            from f5e_tts_tpu.utils.torch_ckpt import backbone_from_torch, load_torch_state_dict

            sd = load_torch_state_dict(teacher, use_ema=True)
            teacher, _ = backbone_from_torch(sd, self.arch)
        teacher = jax.tree.map(jnp.asarray, teacher)
        use_fsdp = self.mesh.shape.get("fsdp", 1) > 1
        use_pipe = self.mesh.shape.get("pipe", 1) > 1
        if fbb.backbone_kind(self.arch) == "dit":
            teacher = tree_map_with_spec(
                lambda x, s: jax.device_put(x, NamedSharding(self.mesh, s)),
                teacher, dit_param_spec(self.arch, fsdp=use_fsdp, pipe=use_pipe))
        else:
            teacher = jax.device_put(teacher, NamedSharding(self.mesh, P()))
        self.teacher_params = teacher
        if cfg_strength is not None:
            self.distill_cfg_strength = cfg_strength

    def make_step(self):
        mel_cfg = self.model_cfg.mel
        arch, cfm, dtype = self.arch, self.cfm, self.compute_dtype
        optimizer = self.optimizer
        ema = fstep.EMASettings.from_train_cfg(self.train_cfg)
        grad_accum = self.train_cfg.grad_accumulation_steps

        cfg_w = self.distill_cfg_strength

        # single jitted step handling both audio->mel and precomputed-mel
        # batches; `teacher` is an explicit jit ARG (None = plain CFM loss,
        # a params pytree = CFG distillation) so it is never baked into the
        # executable as a constant
        def full_step(ts, batch, rng, teacher):
            rng = jax.random.fold_in(rng, ts.micro + ts.skipped)

            def loss_fn(params):
                if teacher is None:
                    out = loss_with_device_mel(params, ts.model_state, arch, cfm,
                                               mel_cfg, batch, rng, dtype)
                else:
                    from f5e_tts_tpu.train.distill import distill_loss_with_device_mel

                    out = distill_loss_with_device_mel(
                        params, teacher, ts.model_state, arch, cfm, mel_cfg,
                        batch, rng, dtype, cfg_strength=cfg_w)
                return out.loss, out

            (loss, out), grads = jax.value_and_grad(loss_fn, has_aux=True)(ts.params)
            return fstep.apply_gradients(ts, loss, out, grads, optimizer=optimizer,
                                         ema=ema, grad_accum=grad_accum)

        # Pin the train-state shardings (captured from the first call's state)
        # for both input and output. Without this, GSPMD picks its own output
        # shardings for the new state — which differ from init_state's
        # dit_param_spec placement — so the SECOND step call recompiles the
        # whole graph (~30 s at Small scale) against the new signature.
        jitted = None

        def _ensure_jitted(ts):
            nonlocal jitted
            if jitted is None:
                state_sh = jax.tree.map(self._canonical_sharding, ts)
                jitted = jax.jit(full_step, donate_argnums=(0,),
                                 in_shardings=(state_sh, None, None, None),
                                 out_shardings=(state_sh, None))
            return jitted

        def step(ts, batch, rng):
            return _ensure_jitted(ts)(ts, batch, rng, self.teacher_params)

        # for cost analysis: builds the jit (with pinned shardings) on demand
        # so lower() works before the first step() call too
        step.lower = lambda ts, batch, rng: _ensure_jitted(ts).lower(
            ts, batch, rng, self.teacher_params)
        return step

    # ------------------------------------------------------------------
    # checkpointing (reference semantics: trainer.py:150-263)
    # ------------------------------------------------------------------

    def _ckpt_path(self, name: str) -> str:
        return os.path.join(self.train_cfg.save_dir, name)

    def save_checkpoint(self, ts: fstep.TrainState, last: bool = False):
        update = int(ts.update)
        name = "model_last" if last else f"model_{update}"
        multiproc = jax.process_count() > 1
        # torch-layout EMA export for interop (like the reference safetensors).
        # Single-process only: device_get on process-sharded leaves is illegal;
        # in multi-host runs export offline from the orbax state instead.
        if fbb.backbone_kind(self.arch) == "dit" and not multiproc:
            from safetensors.numpy import save_file

            from f5e_tts_tpu.utils.torch_ckpt import dit_to_torch

            ema_host = jax.tree.map(np.asarray, jax.device_get(ts.ema_params))
            state_host = jax.tree.map(np.asarray, jax.device_get(ts.model_state))
            sd = dit_to_torch(ema_host, state_host, self.arch)
            sd = {f"ema_model.{k}": v for k, v in sd.items()}
            save_file(sd, self._ckpt_path(f"{name}.safetensors"))
        # full train state via orbax
        import orbax.checkpoint as ocp

        path = os.path.abspath(self._ckpt_path(f"{name}.orbax"))
        ckptr = ocp.StandardCheckpointer()
        if multiproc:
            # collective save: every process writes its addressable shards of
            # the GLOBAL arrays (device_get would throw on non-addressable
            # leaves). All processes must call this together.
            ckptr.save(path, ts, force=True)
        else:
            ckptr.save(path, jax.device_get(ts), force=True)
        ckptr.wait_until_finished()
        if jax.process_index() == 0:
            with open(self._ckpt_path(f"{name}.meta.json"), "w") as f:
                json.dump({"update": update}, f)
            if not last:
                self._rotate()
        if multiproc:
            from f5e_tts_tpu.parallel import multihost

            multihost.barrier(f"ckpt_{name}_{update}")

    def _rotate(self):
        keep = self.train_cfg.keep_last_n_checkpoints
        if keep < 0:
            return
        pat = re.compile(r"model_(\d+)\.orbax$")
        ckpts = sorted(
            (int(m.group(1)), name)
            for name in os.listdir(self.train_cfg.save_dir)
            if (m := pat.match(name)) and not name.startswith("pretrained_")
        )
        import shutil

        while len(ckpts) > keep:
            upd, name = ckpts.pop(0)
            shutil.rmtree(self._ckpt_path(name), ignore_errors=True)
            for ext in (".safetensors", ".meta.json"):
                p = self._ckpt_path(f"model_{upd}{ext}")
                if os.path.exists(p):
                    os.remove(p)

    def load_checkpoint(self, ts: fstep.TrainState) -> fstep.TrainState:
        """Resume: model_last > highest numbered (trainer.py:185-205)."""
        import orbax.checkpoint as ocp

        d = self.train_cfg.save_dir
        candidates = []
        if os.path.exists(os.path.join(d, "model_last.orbax")):
            candidates = ["model_last.orbax"]
        else:
            pat = re.compile(r"model_(\d+)\.orbax$")
            nums = sorted((int(m.group(1)), n) for n in os.listdir(d) if (m := pat.match(n)))
            if nums:
                candidates = [nums[-1][1]]
        if not candidates:
            return ts
        path = os.path.abspath(os.path.join(d, candidates[0]))
        ckptr = ocp.StandardCheckpointer()
        if jax.process_count() > 1:
            # collective restore straight into the live shardings: the target
            # is abstract (shape/dtype/sharding), each process reads only its
            # addressable shards
            target = jax.tree.map(
                lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=x.sharding)
                if hasattr(x, "sharding") else x, ts)
            return ckptr.restore(path, target)
        restored = ckptr.restore(path, jax.device_get(ts))
        return jax.tree.map(
            lambda old, new: jax.device_put(jnp.asarray(new), old.sharding)
            if hasattr(old, "sharding") else jnp.asarray(new),
            ts, restored)

    # ------------------------------------------------------------------
    # loop
    # ------------------------------------------------------------------

    def batch_shardings(self):
        # batch dim 0 shards over both flavors of data parallelism jointly —
        # the single source of truth is parallel.mesh.batch_sharding
        from f5e_tts_tpu.parallel.mesh import batch_sharding

        sh = lambda ndim: batch_sharding(self.mesh, ndim)
        return {
            "audio": sh(2), "mel": sh(3),
            "mel_lens": sh(1), "text_ids": sh(2),
            "text_lens": sh(1), "ppg": sh(3), "ppg_lens": sh(1),
            "audio_16k": sh(2), "audio_16k_lens": sh(1),
        }

    def train(self, loader, epochs: Optional[int] = None, resume: bool = True,
              max_updates: Optional[int] = None):
        tc = self.train_cfg
        epochs = epochs if epochs is not None else tc.epochs
        # schedule horizon in OPTIMIZER updates (reference trainer.py:334:
        # ceil(len(dataloader) / grad_accumulation_steps) * epochs)
        import math

        total_updates = max_updates or (
            math.ceil(len(loader) / tc.grad_accumulation_steps) * epochs)
        # consume a state armed via init_state(pretrained_path=...) — the
        # finetune/distill CLIs load pretrained weights that way; re-initing
        # here would silently discard them (and the step donates the state
        # buffers, so the cache is cleared: it is single-use)
        ts = getattr(self, "_init_ts", None)
        if ts is None:
            ts = self.init_state(total_updates, rng_seed=tc.seed)
        self._init_ts = None
        if resume:
            ts = self.load_checkpoint(ts)
        step = self.make_step()
        shardings = self.batch_shardings()
        rng = jax.random.PRNGKey(tc.seed)
        if jax.process_count() > 1:
            # commit the (identical-everywhere) key as a replicated global
            # array so the jitted step accepts it over the multi-host mesh
            rng = jax.device_put(rng, NamedSharding(self.mesh, P()))

        # preemption handling (the reference has none — SURVEY §5): a SIGTERM
        # requests a final model_last save at the next step boundary so the
        # job resumes exactly where it stopped
        import signal

        preempted = {"flag": False}

        def _on_sigterm(signum, frame):
            preempted["flag"] = True

        try:
            prev_handler = signal.signal(signal.SIGTERM, _on_sigterm)
        except ValueError:  # not on the main thread (tests)
            prev_handler = None

        start_update = int(ts.update)
        t0 = time.time()
        done = False
        # dataloader fast-forward on resume (reference trainer.py:347-352:
        # accelerator.skip_first_batches) — replay the seeded schedule up to
        # the number of batches already consumed (micro-steps incl. NaN skips)
        consumed = int(ts.micro) + int(ts.skipped)
        skip_epochs, skip_batches = divmod(consumed, max(len(loader), 1))
        def prepare_batch(batch):
            if self.ppg_extractor is not None and "ppg" not in batch:
                # on-the-fly PPG extraction on device from the 16 kHz
                # audio carried by the batch (reference trainer.py:385-391
                # extracts from per-item kaldi fbank in the dataloader)
                assert "audio_16k" in batch, (
                    "use_ppg training needs 16 kHz audio in the batch "
                    "(build the dataset with with_16k_audio=True)")
                ppg, ppg_lens = self.ppg_extractor.audio_to_ppg(
                    jnp.asarray(batch["audio_16k"]),
                    jnp.asarray(batch["audio_16k_lens"]))
                batch["ppg"] = np.asarray(ppg)
                batch["ppg_lens"] = np.asarray(ppg_lens)
            if jax.process_count() > 1:
                # each process's loader carries its LOCAL slice of the global
                # batch (dim 0); assemble per-process shards into global
                # arrays — device_put of a full array onto a sharding with
                # non-addressable devices is illegal (the multihost analogue
                # of Accelerate's per-rank dataloader shards)
                def put(v, sh):
                    v = np.asarray(v)
                    gshape = (v.shape[0] * jax.process_count(),) + v.shape[1:]
                    return jax.make_array_from_process_local_data(sh, v, gshape)

                return {k: put(v, shardings[k]) for k, v in batch.items()
                        if k in shardings}
            return {k: jax.device_put(v, shardings[k]) for k, v in batch.items()
                    if k in shardings}

        with self.mesh:
            for epoch in range(skip_epochs, epochs):
                if done:
                    break
                loader.sampler.set_epoch(epoch)
                to_skip = skip_batches if epoch == skip_epochs else 0
                batch_iter = iter(loader)
                for _ in range(to_skip):
                    if next(batch_iter, None) is None:
                        break
                # one-ahead pipeline: dispatch step N asynchronously, pull
                # batch N+1 from the (disk-reading, collating) loader while
                # the device runs, THEN materialize step N's counters. The
                # previous structure blocked on int(ts.update) before
                # touching the loader, idling the chip for every host-side
                # load. Cadence semantics are unchanged: counters are still
                # read for every step before acting on it.
                nxt = next(batch_iter, None)
                while nxt is not None:
                    batch = prepare_batch(nxt)
                    t_step = time.time()
                    prev_update = int(ts.update)  # already materialized; cheap
                    ts, metrics = step(ts, batch, rng)
                    nxt = next(batch_iter, None)  # overlaps the device step
                    update = int(ts.update)  # blocks for THIS step
                    if self.log_fn is not None:
                        self.log_fn({"loss": float(metrics.loss),
                                     "grad_norm": float(metrics.grad_norm),
                                     "extra_loss": float(metrics.extra_loss),
                                     "step_seconds": time.time() - t_step}, update)
                    # cadenced actions fire once per optimizer update, never on
                    # intermediate accumulation micro-steps
                    advanced = update != prev_update
                    if advanced and update % tc.last_per_updates == 0:
                        self.save_checkpoint(ts, last=True)
                    if advanced and update % tc.save_per_updates == 0:
                        self.save_checkpoint(ts)
                    if (self.sample_fn is not None and advanced
                            and update % tc.log_samples_per_updates == 0):
                        self.sample_fn(jax.device_get(ts.ema_params), update)
                    if preempted["flag"]:
                        print("SIGTERM received — checkpointing and exiting")
                        done = True
                        break
                    if max_updates and update >= max_updates:
                        done = True
                        break
        if prev_handler is not None:
            import signal

            signal.signal(signal.SIGTERM, prev_handler)
        self.save_checkpoint(ts, last=True)
        dt = time.time() - t0
        return ts, {"updates": int(ts.update) - start_update, "seconds": dt,
                    "preempted": preempted["flag"]}
