"""Backend selection helper.

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
