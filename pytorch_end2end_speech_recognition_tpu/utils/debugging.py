"""Numerical + distributed sanity guards (SURVEY.md §5.2).

JAX is functional, so the race surface is host-side threading and
cross-host collective order. Provided here:
- `finite_check` / `assert_all_finite`: NaN/Inf guards on pytrees, usable
  inside jit (jax.debug) or at step boundaries on host.
- `sharding_fingerprint` + `check_collective_consistency`: hash of the
  sharding layout tree, all-gathered across hosts at init — a mismatch
  (different code paths / configs per host) fails fast instead of
  deadlocking in a collective.
- Pallas kernels are "sanitized" by running under
  `pltpu.force_tpu_interpret_mode()` in tests (tests/test_pallas_kernels.py).
"""

from __future__ import annotations

import hashlib

import jax
import jax.numpy as jnp
import numpy as np


def finite_check(tree) -> dict[str, bool]:
    """Host-side: map of leaf-path -> all-finite bool."""
    out = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        key = "/".join(str(getattr(p, "key", p)) for p in path)
        arr = np.asarray(leaf)
        out[key] = bool(np.isfinite(arr).all()) if arr.dtype.kind == "f" else True
    return out


def assert_all_finite(tree, what: str = "tree") -> None:
    bad = [k for k, ok in finite_check(tree).items() if not ok]
    if bad:
        raise FloatingPointError(
            f"non-finite values in {what}: {bad[:10]}"
            + ("..." if len(bad) > 10 else "")
        )


def debug_assert_finite(x: jnp.ndarray, name: str = "x"):
    """In-jit NaN guard: prints if non-finite values appear (jax.debug)."""
    bad = jnp.logical_not(jnp.all(jnp.isfinite(x)))

    def _report(b, v):
        if b:
            print(f"[nan-guard] non-finite values in {name}: "
                  f"min={v.min()} max={v.max()}")

    jax.debug.callback(_report, bad, x)
    return x


def sharding_fingerprint(tree) -> str:
    """Stable hash of (path, shape, dtype, sharding spec) for all leaves."""
    h = hashlib.sha256()
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        key = "/".join(str(getattr(p, "key", p)) for p in path)
        h.update(key.encode())
        h.update(str(getattr(leaf, "shape", None)).encode())
        h.update(str(getattr(leaf, "dtype", None)).encode())
        sh = getattr(leaf, "sharding", None)
        h.update(repr(getattr(sh, "spec", sh)).encode())
    return h.hexdigest()


def check_collective_consistency(tree, tag: str = "train_state") -> None:
    """All-gather the fingerprint across hosts; raise on mismatch.

    No-op on a single process. Call once after sharding the train state —
    catches per-host divergence before it becomes a hung collective.
    """
    if jax.process_count() == 1:
        return
    fp = sharding_fingerprint(tree)
    fp_bits = jnp.asarray(
        np.frombuffer(bytes.fromhex(fp)[:8], dtype=np.int64)
    )
    gathered = jax.experimental.multihost_utils.process_allgather(fp_bits)
    if not bool((gathered == gathered[0]).all()):
        raise RuntimeError(
            f"collective-consistency check failed for '{tag}': sharding "
            f"fingerprints differ across hosts ({np.asarray(gathered)})"
        )
