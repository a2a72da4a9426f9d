"""LIO state checkpoint / resume.

The reference has no state persistence — runs are re-startable only via
``--start-scan`` windowing and pose export (SURVEY.md section 5,
"Checkpoint / resume"). Here the ENTIRE pipeline state — voxel hash map,
poses, adaptive-threshold statistics, and the 18-state EKF with
covariance — is a static-shape pytree, so checkpointing is one
``np.savez``: stop a run mid-sequence, restart later (or on another
host/chip count) and continue bit-exact.

Format: one ``.npz`` with flattened pytree leaves keyed ``leaf_000...``
plus a JSON treedef descriptor; portable, no framework dependency to
read back.
"""
from __future__ import annotations

import json

import numpy as np
import jax

FORMAT = "ptudes-tpu-state-v1"


def save_state(path: str, state, extra: dict | None = None) -> None:
    """Serialize any pytree of arrays (e.g. ``lio.LioState``) to ``path``."""
    leaves, treedef = jax.tree.flatten(state)
    payload = {f"leaf_{i:03d}": np.asarray(x) for i, x in enumerate(leaves)}
    meta = {"format": FORMAT, "treedef": str(treedef),
            "n_leaves": len(leaves), "extra": extra or {}}
    payload["__meta__"] = np.frombuffer(
        json.dumps(meta).encode(), dtype=np.uint8)
    np.savez_compressed(path, **payload)


def load_state(path: str, like):
    """Restore a pytree saved by :func:`save_state`.

    ``like`` is a template pytree with the expected structure (e.g.
    ``lio.init_state(cfg)``); its treedef is used to unflatten, and leaf
    shapes/dtypes are validated so a config mismatch fails loudly instead
    of corrupting a run.
    """
    with np.load(path) as z:
        meta = json.loads(bytes(z["__meta__"]).decode())
        if meta.get("format") != FORMAT:
            raise ValueError(f"{path}: not a {FORMAT} checkpoint")
        leaves = [z[f"leaf_{i:03d}"] for i in range(meta["n_leaves"])]
    t_leaves, treedef = jax.tree.flatten(like)
    if len(t_leaves) != len(leaves):
        raise ValueError(
            f"{path}: {len(leaves)} leaves, template has {len(t_leaves)} "
            "(config/capacity mismatch?)")
    for i, (a, b) in enumerate(zip(leaves, t_leaves)):
        if tuple(a.shape) != tuple(np.shape(b)) or a.dtype != np.asarray(
                b).dtype:
            raise ValueError(
                f"{path}: leaf {i} is {a.shape}/{a.dtype}, template "
                f"expects {np.shape(b)}/{np.asarray(b).dtype} "
                "(config/capacity mismatch?)")
    return jax.tree.unflatten(treedef, leaves)


def checkpoint_extra(path: str) -> dict:
    """Read just the user 'extra' metadata of a checkpoint."""
    with np.load(path) as z:
        meta = json.loads(bytes(z["__meta__"]).decode())
    return meta.get("extra", {})
