"""Sharding rules: parameter paths -> PartitionSpecs over the mesh.

Capability parity + extension: the reference genre only has DP
(`nn.DataParallel`/DDP, SURVEY.md §2c). Here DP + Megatron-style TP:

- encoder FFN: fc1 kernel sharded on its output (ffn) dim, fc2 on input —
  one all-reduce per FFN (inserted by GSPMD).
- attention q/k/v kernels sharded on the head (output) dim, output proj on
  input dim.
- LSTM gate matrices (w_ih/w_hh, shape (D, 4H)) sharded on the 4H dim.
- everything else replicated.

Specs are assigned by regex on the nnx.State path, t5x-style; optimizer
state inherits shardings by jit output propagation (`tx.init` under jit).
"""

from __future__ import annotations

import re

import jax
from jax.sharding import NamedSharding, PartitionSpec as P

from pytorch_end2end_speech_recognition_tpu.parallel.mesh import (
    DATA_AXIS,
    MODEL_AXIS,
)

# (path regex, spec builder); first match wins. Paths look like
# 'encoder/layers/0/fwd/w_ih' or 'encoder/blocks/3/mhsa/q/kernel'.
RULES: list[tuple[str, P]] = [
    (r".*/(w_ih|w_hh)$", P(None, MODEL_AXIS)),          # LSTM gates
    (r".*/(fc1|q|k|v|pw1|wq1|wk1|wv1|wq2|wk2|wv2)/kernel$",
     P(None, MODEL_AXIS)),
    (r".*/(fc2|o|pw2|wo1|wo2)/kernel$", P(MODEL_AXIS, None)),
    (r".*/embed/embedding$", P(None, None)),
    (r".*", P()),                                        # replicate
]


def path_str(path) -> str:
    parts = []
    for p in path:
        key = getattr(p, "key", None)
        if key is None:
            key = getattr(p, "idx", None)
        if key is None:
            key = str(p)
        parts.append(str(key).lstrip("."))
    if parts and parts[-1] == "value":  # nnx Param wrapper attribute
        parts = parts[:-1]
    return "/".join(parts)


def spec_for(path, leaf) -> P:
    s = path_str(path)
    ndim = getattr(leaf, "ndim", 0)
    for pat, spec in RULES:
        if re.fullmatch(pat, s):
            if len(spec) > ndim:
                return P()
            # only shard dims divisible later at device_put; GSPMD pads
            return spec
    return P()


def _divisible_or_replicated(mesh, leaf, spec: P) -> P:
    """Drop axis assignments whose dim isn't divisible by the axis size."""
    shape = getattr(leaf, "shape", ())
    out = []
    changed = False
    for d, axis in enumerate(spec):
        if axis is None:
            out.append(None)
            continue
        if d < len(shape) and shape[d] % mesh.shape[axis] == 0:
            out.append(axis)
        else:
            out.append(None)
            changed = True
    spec = P(*out) if out else P()
    return spec if not changed or any(a for a in out) else P()


def param_specs(mesh, params) -> list[tuple[str, P]]:
    """(path string, PartitionSpec) for every param leaf, in flatten order."""
    flat, _ = jax.tree_util.tree_flatten_with_path(params)
    return [
        (path_str(p), _divisible_or_replicated(mesh, leaf, spec_for(p, leaf)))
        for p, leaf in flat
    ]


def shard_train_state(mesh, params, opt_state, tp_rules: bool = True):
    """Place params per rules. Optimizer-state leaves that are param-shaped
    (adam mu/nu mirror the param tree) inherit the matching spec; everything
    else is replicated. With tp_rules=False everything is replicated —
    used when pipeline parallelism owns the 'model' axis (stage staging
    happens functionally inside parallel/pp.py)."""
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    shape_to_spec: dict[tuple, P] = {}
    new_leaves = []
    for path, leaf in flat:
        spec = (_divisible_or_replicated(mesh, leaf, spec_for(path, leaf))
                if tp_rules else P())
        shape_to_spec.setdefault(tuple(leaf.shape), spec)
        new_leaves.append(jax.device_put(leaf, NamedSharding(mesh, spec)))
    params = jax.tree_util.tree_unflatten(treedef, new_leaves)

    def put(leaf):
        spec = shape_to_spec.get(tuple(getattr(leaf, "shape", ())), P())
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    opt_state = jax.tree_util.tree_map(put, opt_state)
    return params, opt_state


def shard_batch(mesh, arrays):
    """Shard batch arrays over the 'data' axis (leading dim).

    Single-process: a plain device_put split over the mesh. Multi-process
    (the genre's DDP + DistributedSampler, SURVEY.md §3.3): each host holds
    only ITS shard of the global batch (rows from its BucketedLoader
    shard_index), and `make_array_from_process_local_data` assembles the
    global array — host rows land on host-local devices, so no DCN traffic
    for input feed."""
    import numpy as np

    sh = NamedSharding(mesh, P(DATA_AXIS))
    if jax.process_count() > 1:
        return tuple(
            jax.make_array_from_process_local_data(sh, np.asarray(a))
            for a in arrays
        )
    return tuple(jax.device_put(a, sh) for a in arrays)


def replicate(mesh, tree):
    sh = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)
