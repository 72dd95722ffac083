"""Rendering / evaluation layer (reference renderer.py)."""

from iffnerf_tpu.render.renderer import render_chunked, evaluation, evaluation_path
