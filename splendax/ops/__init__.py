"""Pallas TPU kernels for hot ops."""

from .fused_actor_critic import fused_masked_forward  # noqa: F401
