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
    enable_compile_cache()


def ensure_feature_width(kmerlen: int):
    """Enable jax x64 mode for the 64-bit feature config (k > 16).

    The reference binds this at compile time (-DMC_KMER_TYPE=uint64_t,
    src/config.hpp:45-48); here it is a runtime switch that must flip
    before any u64 device array is created (without x64, jnp silently
    truncates uint64 to uint32)."""
    if kmerlen > 16:
        import jax
        if not jax.config.jax_enable_x64:
            jax.config.update("jax_enable_x64", True)


_HBM_BY_KIND = (
    # device_kind substring -> total HBM bytes
    ("v5 lite", 16 << 30), ("v5e", 16 << 30),
    ("v5p", 95 << 30), ("v5", 95 << 30),
    ("v4", 32 << 30), ("v3", 32 << 30), ("v2", 16 << 30),
    ("v6 lite", 32 << 30), ("v6e", 32 << 30),
)


def hbm_budget_bytes(device=None) -> int:
    """Device memory available for the database, mirroring the
    reference's free-VRAM-minus-reserve sizing
    (src/gpu_hashmap.cu:1114-1133: free memory minus 2 GB).

    MC_HBM_GB overrides the measured/assumed total. The reserve
    (max(2 GiB, 20%) of total) covers batch working sets, XLA scratch
    and the query step's intermediates.
    """
    env = os.environ.get("MC_HBM_GB")
    total = None
    if env:
        try:
            total = int(float(env) * 2**30)
        except ValueError:
            total = None
    if total is None:
        import jax
        d = device if device is not None else jax.devices()[0]
        try:
            stats = d.memory_stats()
            total = stats.get("bytes_limit") or stats.get(
                "bytes_reservable_limit")
        except Exception:
            total = None
        if not total:
            kind = getattr(d, "device_kind", "").lower()
            for sub, bytes_ in _HBM_BY_KIND:
                if sub in kind:
                    total = bytes_
                    break
        if not total:
            # CPU / unknown backend: assume a v5e-sized budget so layout
            # decisions in tests match single-chip TPU behavior
            total = 16 << 30
    reserve = max(2 << 30, total // 5)
    return max(total - reserve, 64 << 20)


def enable_compile_cache():
    """Persistent XLA compilation cache (measured on this TPU tunnel:
    53 s compile -> 3.6 s on cache hit). MC_JAX_CACHE=0 disables;
    MC_JAX_CACHE_DIR overrides the location."""
    if os.environ.get("MC_JAX_CACHE", "1") == "0":
        return
    cache_dir = os.environ.get(
        "MC_JAX_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "metacache_tpu",
                     "jax"))
    try:
        os.makedirs(cache_dir, exist_ok=True)
        import jax
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        pass  # cache is an optimization only; never fail startup
