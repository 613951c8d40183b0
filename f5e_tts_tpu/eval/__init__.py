"""Evaluation harness: batch inference over testsets, WER/SIM/UTMOS scoring."""
