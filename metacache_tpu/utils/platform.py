"""JAX platform selection helper.

This container force-registers an experimental TPU backend via
sitecustomize and overrides the JAX_PLATFORMS env var; use
MC_JAX_PLATFORM=cpu (or force_platform("cpu")) to pin computations to a
specific backend (must run before the first JAX computation).
"""
import os


def force_platform(name: str | None = None):
    name = name or os.environ.get("MC_JAX_PLATFORM")
    if name:
        import jax
        jax.config.update("jax_platforms", name)
