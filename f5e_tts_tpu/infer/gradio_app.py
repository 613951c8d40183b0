"""Gradio web UI for inference.

reference: src/f5_tts/infer/infer_gradio.py:131-1090 — basic TTS tab,
multi-speech-type generation, custom model loading, voice-chat tab
(reference :742-885; orchestration in infer/voice_chat.py, LLM weights gated
on a local HF directory).

gradio is not bundled in this environment: the module gates at import with a
clear error, and `build_app()` is importable for environments that have it.
"""

from __future__ import annotations

import re

from f5e_tts_tpu.infer.voice_chat import DEFAULT_SYSTEM_PROMPT as _DEFAULT_SYSTEM_PROMPT


def _require_gradio():
    try:
        import gradio as gr  # noqa: F401

        return gr
    except ImportError as e:
        raise ImportError(
            "gradio is not installed in this environment; "
            "`pip install gradio` to use the web UI") from e


def parse_speechtypes_text(gen_text: str):
    """Split '{Style} text...' chunks (reference: infer_gradio.py:438-470)."""
    tokens = re.split(r"(\{[^\}]+\})", gen_text)
    segments = []
    style = "Regular"
    for tok in tokens:
        if not tok.strip():
            continue
        m = re.match(r"\{(.+)\}", tok)
        if m:
            style = m.group(1).strip()
        else:
            segments.append({"style": style, "text": tok.strip()})
    return segments


def build_app(tts=None, default_model: str = "F5TTS_v1_Base"):
    """Construct the gradio Blocks app around an F5TTS instance."""
    gr = _require_gradio()
    import numpy as np

    from f5e_tts_tpu.api import F5TTS

    state = {"tts": tts}

    def ensure_model(ckpt_file="", vocab_file="", vocoder_path=""):
        if state["tts"] is None:
            state["tts"] = F5TTS(model=default_model, ckpt_file=ckpt_file,
                                 vocab_file=vocab_file,
                                 vocoder_local_path=vocoder_path or None)
        return state["tts"]

    def basic_tts(ref_audio, ref_text, gen_text, remove_silence, cross_fade,
                  nfe, speed, seed):
        t = ensure_model()
        sr_in, wav_in = ref_audio  # gradio numpy audio
        wav_in = np.asarray(wav_in, np.float32)
        if wav_in.dtype == np.int16 or wav_in.max() > 2:
            wav_in = wav_in / 32768.0
        if wav_in.ndim == 2:
            wav_in = wav_in.mean(axis=1)
        # ref preprocessing incl. auto-transcription when ref_text is blank
        # (reference infer_gradio.py routes through preprocess_ref_audio_text)
        from f5e_tts_tpu.infer.pipeline import preprocess_ref_audio_text
        from f5e_tts_tpu.infer.transcribe import make_cached_transcriber

        wav_in, ref_text = preprocess_ref_audio_text(
            wav_in, sr_in, ref_text or "",
            transcribe=make_cached_transcriber(getattr(t, "asr_model", None)))
        out, sr, _ = t.engine.infer(
            wav_in, sr_in, ref_text, gen_text,
            seed=int(seed) if seed else 0,
            nfe_steps=int(nfe), speed=speed, cross_fade_duration=cross_fade)
        if remove_silence:
            from f5e_tts_tpu.infer.audio import remove_silence_edges

            out = remove_silence_edges(out, sr)
        return (sr, out)

    def multistyle_tts(gen_text, *style_rows):
        """style_rows: flattened (name, (sr, wav), ref_text) triples."""
        t = ensure_model()
        voices = {}
        for i in range(0, len(style_rows), 3):
            name, audio, rtext = style_rows[i : i + 3]
            if name and audio is not None:
                voices[name] = (audio, rtext or "")
        segments = parse_speechtypes_text(gen_text)
        outs = []
        sr = t.target_sample_rate
        for seg in segments:
            voice = voices.get(seg["style"]) or voices.get("Regular")
            if voice is None:
                continue
            (sr_in, wav_in), rtext = voice
            wav_in = np.asarray(wav_in, np.float32)
            if wav_in.ndim == 2:
                wav_in = wav_in.mean(axis=1)
            if wav_in.max() > 2:
                wav_in = wav_in / 32768.0
            out, sr, _ = t.engine.infer(wav_in, sr_in, rtext, seg["text"])
            outs.append(out)
        final = np.concatenate(outs) if outs else np.zeros(0, np.float32)
        return (sr, final)

    with gr.Blocks(title="F5E-TTS-TPU") as app:
        gr.Markdown("# F5E-TTS (TPU-native)")
        with gr.Tab("Basic TTS"):
            ref_audio = gr.Audio(label="Reference audio", type="numpy")
            ref_text = gr.Textbox(label="Reference text (blank = unknown)")
            gen_text = gr.Textbox(label="Text to generate", lines=4)
            with gr.Row():
                remove_sil = gr.Checkbox(label="Remove silences", value=False)
                cross_fade = gr.Slider(0.0, 1.0, 0.15, label="Cross-fade (s)")
                nfe = gr.Slider(4, 64, 32, step=2, label="NFE steps")
                speed = gr.Slider(0.3, 2.0, 1.0, label="Speed")
                seed = gr.Number(label="Seed", value=0)
            out_audio = gr.Audio(label="Output")
            gr.Button("Synthesize").click(
                basic_tts, [ref_audio, ref_text, gen_text, remove_sil, cross_fade,
                            nfe, speed, seed], out_audio)
        with gr.Tab("Multi-Speech-Type"):
            gr.Markdown("Mark styles inline as `{Style} text...`; define each style below.")
            ms_text = gr.Textbox(label="Script", lines=6)
            rows = []
            for i in range(4):
                with gr.Row():
                    rows += [gr.Textbox(label=f"Style {i} name",
                                        value="Regular" if i == 0 else ""),
                             gr.Audio(label="Ref audio", type="numpy"),
                             gr.Textbox(label="Ref text")]
            ms_out = gr.Audio(label="Output")
            gr.Button("Generate Multi-Style").click(multistyle_tts, [ms_text] + rows, ms_out)
        with gr.Tab("Voice Chat"):
            # reference: infer_gradio.py:742-885 (Qwen voice-chat tab)
            gr.Markdown("Chat with an LLM that replies in the reference voice. "
                        "Load a local HF causal-LM directory first.")
            chat_state = {"vc": None}
            llm_path = gr.Textbox(label="Chat model path (local HF dir)")
            vc_ref_audio = gr.Audio(label="Reference voice", type="numpy")
            vc_ref_text = gr.Textbox(label="Reference text (blank = unknown)")
            system_prompt = gr.Textbox(label="System prompt",
                                       value=_DEFAULT_SYSTEM_PROMPT, lines=2)
            chatbox = gr.Chatbot(label="Conversation", type="messages")
            user_text = gr.Textbox(label="Your message", lines=1)
            vc_out = gr.Audio(label="Spoken reply", autoplay=True)

            def chat_round(path, ref, rtext, sys_p, text):
                from f5e_tts_tpu.infer.voice_chat import VoiceChat, load_chat_model

                t = ensure_model()
                if chat_state["vc"] is None or chat_state["vc"].system_prompt != sys_p:
                    sr_in, wav_in = ref
                    wav_in = np.asarray(wav_in, np.float32)
                    if wav_in.ndim == 2:
                        wav_in = wav_in.mean(axis=1)
                    if wav_in.max() > 2:
                        wav_in = wav_in / 32768.0
                    chat_state["vc"] = VoiceChat(
                        t.engine, wav_in, sr_in, rtext or "",
                        respond_fn=load_chat_model(path), system_prompt=sys_p)
                reply, wav, sr = chat_state["vc"].chat(text=text)
                return chat_state["vc"].messages, (sr, wav) if wav is not None else None

            gr.Button("Send").click(
                chat_round, [llm_path, vc_ref_audio, vc_ref_text, system_prompt,
                             user_text], [chatbox, vc_out])

            def clear_chat():
                if chat_state["vc"] is not None:
                    chat_state["vc"].clear()
                return [], None

            gr.Button("Clear Conversation").click(clear_chat, None, [chatbox, vc_out])
    return app


def main():
    app = build_app()
    app.launch()


if __name__ == "__main__":
    main()
