"""Inference layer: evaluation, demo pipeline, rendering, CLIs."""
