"""Gradio finetuning UI: dataset prep, vocab tools, checkpoint utilities, training.

reference: src/f5_tts/train/finetune_gradio.py (1.9k lines) — the pipeline
pieces that do the work are implemented here as plain functions (usable
headless and covered by tests); the gradio Blocks wrapper gates on the gradio
import. The Whisper transcription tab needs local ASR weights (offline build).
"""

from __future__ import annotations

from typing import List

import numpy as np


# ---------------------------------------------------------------------------
# audio slicer (reference: finetune_gradio.py:219-335, Slicer class semantics)
# ---------------------------------------------------------------------------


def slice_audio(
    wav: np.ndarray,
    sr: int,
    threshold_db: float = -40.0,
    min_length_ms: float = 5000,
    min_interval_ms: float = 300,
    hop_ms: float = 10,
    max_sil_kept_ms: float = 500,
) -> List[np.ndarray]:
    """RMS-threshold silence slicing into utterances."""
    hop = max(int(sr * hop_ms / 1000), 1)
    win = hop * 2
    n_frames = max((len(wav) - win) // hop + 1, 0)
    if n_frames <= 0:
        return [wav]
    rms = np.asarray([
        np.sqrt(np.mean(wav[i * hop : i * hop + win] ** 2) + 1e-12)
        for i in range(n_frames)
    ])
    db = 20 * np.log10(rms + 1e-12)
    silent = db < threshold_db

    min_len = int(min_length_ms / hop_ms)
    min_int = int(min_interval_ms / hop_ms)
    max_kept = int(max_sil_kept_ms / hop_ms)

    # find silence runs long enough to cut at
    cuts = []
    i = 0
    while i < n_frames:
        if silent[i]:
            j = i
            while j < n_frames and silent[j]:
                j += 1
            if j - i >= min_int:
                cuts.append((i, j))
            i = j
        else:
            i += 1

    segments = []
    prev = 0
    for (a, b) in cuts:
        cut_at = (a + b) // 2
        if cut_at - prev >= min_len:
            start = max(prev - 0, 0)
            end = min(cut_at + max_kept, n_frames)
            segments.append(wav[start * hop : end * hop])
            prev = cut_at
    if n_frames - prev >= 1:
        segments.append(wav[prev * hop :])
    return [s for s in segments if len(s) > 0] or [wav]


# ---------------------------------------------------------------------------
# vocab tools (reference: finetune_gradio.py:899-1034)
# ---------------------------------------------------------------------------


def vocab_check(texts: List[str], vocab: dict, tokenizer: str = "char") -> List[str]:
    """Return the characters/tokens missing from the vocab."""
    from f5e_tts_tpu.utils.text import convert_char_to_pinyin

    missing = set()
    for t in texts:
        toks = convert_char_to_pinyin([t])[0] if tokenizer == "pinyin" else list(t)
        for tok in toks:
            if tok not in vocab:
                missing.add(tok)
    return sorted(missing)


def vocab_extend(vocab_path: str, new_tokens: List[str], out_path: str) -> int:
    """Append new tokens to vocab.txt; returns new size
    (finetune_gradio.py:995-1010)."""
    from f5e_tts_tpu.utils.text import load_vocab_file

    vocab = load_vocab_file(vocab_path)
    tokens = [t for t in new_tokens if t not in vocab]
    with open(vocab_path, "r", encoding="utf-8") as f:
        lines = [line.rstrip("\n") for line in f]
    lines += tokens
    with open(out_path, "w", encoding="utf-8") as f:
        f.write("\n".join(lines) + "\n")
    return len(lines)


def expand_embeddings_for_vocab(ckpt_path: str, out_path: str, new_vocab_size: int,
                                arch=None) -> int:
    """Grow the text embedding table of a checkpoint to a larger vocab
    (new rows random-init), reference: finetune_gradio.py:1012-1034."""
    import jax

    from f5e_tts_tpu.utils.torch_ckpt import load_torch_state_dict

    sd = load_torch_state_dict(ckpt_path, use_ema=True)
    key = "transformer.text_embed.text_embed.weight"
    old = sd[key]
    if old.shape[0] >= new_vocab_size + 1:
        added = 0
    else:
        added = new_vocab_size + 1 - old.shape[0]
        rng = np.random.default_rng(0)
        extra = rng.normal(0, old.std(), (added, old.shape[1])).astype(old.dtype)
        sd[key] = np.concatenate([old, extra], axis=0)
    from safetensors.numpy import save_file

    save_file({f"ema_model.{k}": np.ascontiguousarray(v) for k, v in sd.items()}, out_path)
    return added


def prune_checkpoint(ckpt_path: str, out_path: str) -> None:
    """Strip optimizer/EMA bookkeeping, keep inference weights only
    (reference: finetune_gradio.py:970-993)."""
    from safetensors.numpy import save_file

    from f5e_tts_tpu.utils.torch_ckpt import load_torch_state_dict

    sd = load_torch_state_dict(ckpt_path, use_ema=True)
    save_file({f"ema_model.{k}": np.ascontiguousarray(v) for k, v in sd.items()}, out_path)


# ---------------------------------------------------------------------------
# gradio wrapper (gated)
# ---------------------------------------------------------------------------


def build_app():
    try:
        import gradio as gr
    except ImportError as e:
        raise ImportError("gradio is not installed; pip install gradio for the UI") from e

    with gr.Blocks(title="F5E-TTS-TPU finetune") as app:
        gr.Markdown("# Finetune (TPU)")
        with gr.Tab("Prepare data"):
            inp = gr.Textbox(label="Corpus dir (metadata.csv + wavs)")
            out = gr.Textbox(label="Output dataset dir")
            tok = gr.Dropdown(["char", "pinyin", "byte"], value="pinyin", label="Tokenizer")
            log = gr.JSON(label="Stats")

            def _prep(inp, out, tok):
                from f5e_tts_tpu.data.prepare import prepare, rows_from_csv

                return prepare(rows_from_csv(inp), out, tok)

            gr.Button("Prepare").click(_prep, [inp, out, tok], log)
        with gr.Tab("Vocab check"):
            vpath = gr.Textbox(label="vocab.txt path")
            texts = gr.Textbox(label="Texts (one per line)", lines=6)
            missing = gr.JSON(label="Missing tokens")

            def _check(vpath, texts):
                from f5e_tts_tpu.utils.text import load_vocab_file

                return vocab_check(texts.splitlines(), load_vocab_file(vpath))

            gr.Button("Check").click(_check, [vpath, texts], missing)
        with gr.Tab("Prune checkpoint"):
            cin = gr.Textbox(label="Training ckpt (.pt/.safetensors)")
            cout = gr.Textbox(label="Output .safetensors")
            done = gr.Textbox(label="Status")
            gr.Button("Prune").click(
                lambda a, b: (prune_checkpoint(a, b) or f"wrote {b}"), [cin, cout], done)
    return app


if __name__ == "__main__":
    build_app().launch()
