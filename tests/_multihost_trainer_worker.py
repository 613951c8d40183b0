"""Worker for the 2-process multihost Trainer proof (VERDICT r4 #6).

Launched by tests/test_multihost_trainer.py as
``python tests/_multihost_trainer_worker.py <coord> <num_procs> <proc_id> <dir>``.
Each process brings 2 local CPU devices; the Trainer runs over the global
data=2 x fsdp=2 mesh, so the gradient all-reduce, the fsdp all-gathers, the
orbax checkpoint, and the dataloader shards all genuinely cross the process
boundary. Three phases:

  A. 6 uninterrupted updates, recording per-update losses.
  B. fresh dir: SIGTERM delivered to BOTH processes at update 3 (a real
     preemption hits every host) -> collective model_last save + clean exit.
  C. fresh Trainer resumes from B's checkpoint and trains to update 6;
     losses for updates 4-6 must be BITWISE equal to phase A's.

reference analogue: Accelerate DDP training + resume
(src/f5_tts/model/trainer.py:63-68, 185-263).
"""

import os
import signal
import sys

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 2)

import numpy as np  # noqa: E402

from f5e_tts_tpu.config import DiTConfig, MelConfig, MeshConfig, ModelConfig, TrainConfig  # noqa: E402
from f5e_tts_tpu.parallel import multihost  # noqa: E402
from f5e_tts_tpu.train.trainer import Trainer  # noqa: E402
from f5e_tts_tpu.utils.text import list_str_to_idx  # noqa: E402

MEL = MelConfig(n_fft=256, hop_length=64, win_length=256, n_mel_channels=12,
                target_sample_rate=8000)
ARCH = DiTConfig(dim=32, depth=2, heads=2, dim_head=16, ff_mult=2, mel_dim=12,
                 text_dim=16, conv_layers=0, dropout=0.0)
VOCAB = {c: i for i, c in enumerate(" abcdefgh")}
GLOBAL_B, LOCAL_B, FRAMES, TEXT_LEN = 4, 2, 64, 8


def _tokenize(texts):
    return list_str_to_idx([list(t) for t in texts], VOCAB)


class _Sampler:
    def set_epoch(self, epoch):
        pass


class FakeShardedLoader:
    """Deterministic synthetic batches; each process yields its contiguous
    LOCAL slice (rows proc_id*LOCAL_B:(proc_id+1)*LOCAL_B) of the global
    batch — the multihost Trainer assembles the shards into global arrays."""

    def __init__(self, n_batches: int, proc_id: int):
        self.n = n_batches
        self.proc = proc_id
        self.sampler = _Sampler()

    def __len__(self):
        return self.n

    def __iter__(self):
        for i in range(self.n):
            r = np.random.default_rng(1000 + i)
            mel = (0.5 * r.standard_normal((GLOBAL_B, FRAMES, 12))).astype(np.float32)
            text = r.integers(1, len(VOCAB), (GLOBAL_B, TEXT_LEN)).astype(np.int32)
            sl = slice(self.proc * LOCAL_B, (self.proc + 1) * LOCAL_B)
            yield {
                "mel": mel[sl],
                "mel_lens": np.full((LOCAL_B,), FRAMES, np.int32),
                "text_ids": text[sl],
                "text_lens": np.full((LOCAL_B,), TEXT_LEN, np.int32),
            }


def make_trainer(save_dir: str, log_fn) -> Trainer:
    model_cfg = ModelConfig(name="tiny", backbone="DiT", arch=ARCH, mel=MEL)
    train_cfg = TrainConfig(learning_rate=1e-3, num_warmup_updates=1,
                            save_per_updates=10**9, last_per_updates=10**9,
                            save_dir=save_dir, compute_dtype="float32",
                            mesh=MeshConfig(data=2, fsdp=2, model=1, seq=1))
    return Trainer(model_cfg, train_cfg, vocab_size=len(VOCAB),
                   tokenize=_tokenize, log_fn=log_fn)


def main() -> None:
    coord, num_procs, proc_id, root = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4])
    multihost.initialize(coordinator_address=coord, num_processes=num_procs,
                         process_id=proc_id)
    assert len(jax.devices()) == 4 and len(jax.local_devices()) == 2

    # --- phase A: uninterrupted run, per-update loss record -------------
    losses_a = {}
    trainer_a = make_trainer(os.path.join(root, "a"),
                             lambda m, u: losses_a.__setitem__(u, m["loss"]))
    ts_a, info_a = trainer_a.train(FakeShardedLoader(8, proc_id), epochs=2,
                                   resume=False, max_updates=6)
    assert int(ts_a.update) == 6, int(ts_a.update)
    assert sorted(losses_a) == [1, 2, 3, 4, 5, 6], sorted(losses_a)

    # --- phase B: SIGTERM both processes at update 3 ---------------------
    fired = {"done": False}

    def sigterm_at_3(m, u):
        if u == 3 and not fired["done"]:
            fired["done"] = True
            os.kill(os.getpid(), signal.SIGTERM)

    dir_b = os.path.join(root, "b")
    trainer_b = make_trainer(dir_b, sigterm_at_3)
    ts_b, info_b = trainer_b.train(FakeShardedLoader(8, proc_id), epochs=2,
                                   resume=False, max_updates=6)
    assert info_b["preempted"] is True
    assert int(ts_b.update) == 3, int(ts_b.update)
    assert os.path.exists(os.path.join(dir_b, "model_last.orbax")), "collective save missing"

    # --- phase C: resume across the process boundary ---------------------
    losses_c = {}
    trainer_c = make_trainer(dir_b,
                             lambda m, u: losses_c.__setitem__(u, m["loss"]))
    ts_c, info_c = trainer_c.train(FakeShardedLoader(8, proc_id), epochs=2,
                                   resume=True, max_updates=6)
    assert int(ts_c.update) == 6, int(ts_c.update)
    assert sorted(losses_c) == [4, 5, 6], sorted(losses_c)
    for u in (4, 5, 6):
        assert losses_c[u] == losses_a[u], (
            f"update {u}: resumed loss {losses_c[u]!r} != uninterrupted {losses_a[u]!r}")

    multihost.barrier("trainer_done")
    print(f"MULTIHOST_TRAINER_OK proc={proc_id} "
          f"losses={[round(losses_a[u], 6) for u in (4, 5, 6)]}")


if __name__ == "__main__":
    main()
