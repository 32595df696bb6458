"""Integrators ("model families"): direct, megakernel, wavefront,
differentiable inverse rendering."""

from .megakernel import MegakernelConfig, render, render_sample_batch  # noqa: F401
