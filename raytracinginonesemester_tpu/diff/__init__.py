"""Differentiable rendering: parameter plumbing, inverse optimization,
checkpointing, and the edge-aware soft renderer."""

from .inverse import (
    apply_params,
    extract_params,
    make_train_step,
    optimize,
    render_loss,
)
from .soft import render_soft, soft_render_loss

__all__ = [
    "apply_params",
    "extract_params",
    "make_train_step",
    "optimize",
    "render_loss",
    "render_soft",
    "soft_render_loss",
]
