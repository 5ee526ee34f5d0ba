"""JAX platform selection helper.

This container force-registers an experimental TPU backend via
sitecustomize and overrides the JAX_PLATFORMS env var; use
MC_JAX_PLATFORM=cpu (or force_platform("cpu")) to pin computations to a
specific backend (must run before the first JAX computation).
"""
import os


def force_platform(name: str | None = None):
    # NOTE: this environment's TPU plugin ignores the JAX_PLATFORMS env
    # var, so the choice must be forced through jax.config before the
    # backend initializes; honor JAX_PLATFORMS here for harnesses that
    # set only it.
    name = (name or os.environ.get("MC_JAX_PLATFORM") or
            os.environ.get("JAX_PLATFORMS"))
    if name:
        import jax
        jax.config.update("jax_platforms", name)
