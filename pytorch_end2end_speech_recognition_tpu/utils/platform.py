"""Backend selection + compilation-cache helpers.

This machine image force-registers the TPU backend via sitecustomize and
overrides JAX_PLATFORMS, so `ASR_TPU_FORCE_CPU=1` (or --cpu flags) lets CLI
users pin CPU explicitly — useful when the chip is busy or for hermetic runs.
"""

from __future__ import annotations

import os


def maybe_force_cpu(flag: bool = False) -> None:
    if flag or os.environ.get("ASR_TPU_FORCE_CPU"):
        import jax

        jax.config.update("jax_platforms", "cpu")


def configure_prng(impl: str = "rbg") -> None:
    """Select the PRNG behind jax.random.PRNGKey. 'rbg' uses the TPU
    hardware RNG — threefry2x32 counters otherwise get fused into every
    dropout-adjacent matmul and measurably drag the train step (profiled
    ~3x on the FFN down-projection fusions at the flagship shape). Call
    BEFORE creating any keys; keys made earlier keep their old impl."""
    import jax

    try:
        jax.config.update("jax_default_prng_impl", impl)
    except Exception as e:  # pragma: no cover - impl name typo etc.
        import sys

        print(f"warning: prng impl {impl!r} not applied: {e!r}",
              file=sys.stderr)


def enable_compilation_cache(path: str | None = None) -> str:
    """Persist XLA executables across processes.

    Large jitted graphs (the 12-layer Conformer train step) take minutes to
    compile on a small host; the genre pays an analogous warmup through
    cuDNN benchmarking but per-process. Every jit-using CLI calls this at
    startup so the second invocation of any entry point starts in seconds.
    Honors an existing JAX_COMPILATION_CACHE_DIR; defaults under ~/.cache.
    """
    path = (path or os.environ.get("JAX_COMPILATION_CACHE_DIR")
            or os.path.join(os.path.expanduser("~"), ".cache",
                            "asr_tpu_xla_cache"))
    try:
        os.makedirs(path, exist_ok=True)
        import jax

        jax.config.update("jax_compilation_cache_dir", path)
        # keep a small floor so trivial sub-second compiles don't grow the
        # shared unbounded cache dir; beam/eval graphs all exceed this
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception as e:  # cache is an optimization; never fail startup
        import sys

        print(f"warning: compilation cache disabled ({path}): {e!r}",
              file=sys.stderr)
        return ""
    return path
