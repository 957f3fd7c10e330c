"""Runtime state snapshot: save/restore the frame carry + camera.

Checkpoint/resume parity (SURVEY.md §5.4): the reference persists only its
scene build cache; here the ENTIRE cross-frame runtime state (TAA history,
exposure, DDGI probes, HZB, shadow history, reservoirs) is one pytree, so
checkpointing is a flatten + npz write — converged GI/exposure state
survives restarts.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

SNAPSHOT_VERSION = 1


def _flatten_carry(carry, prefix=""):
    flat = {}
    for k, v in carry.items():
        key = f"{prefix}{k}"
        if isinstance(v, dict):
            flat.update(_flatten_carry(v, key + "/"))
        elif isinstance(v, tuple):
            for i, x in enumerate(v):
                flat[f"{key}#{i}"] = np.asarray(x)
        else:
            flat[key] = np.asarray(v)
    return flat


def _unflatten_carry(flat):
    carry = {}
    tuples = {}
    for key, v in flat.items():
        parts = key.split("/")
        node = carry
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        leaf = parts[-1]
        if "#" in leaf:
            name, idx = leaf.split("#")
            tuples.setdefault((id(node), name), []).append((int(idx), v))
            node.setdefault(name, tuples[(id(node), name)])
        else:
            node[leaf] = v
    def fix(node):
        for k, v in list(node.items()):
            if isinstance(v, dict):
                fix(v)
            elif isinstance(v, list):
                node[k] = tuple(x for _, x in sorted(v))
    fix(carry)
    return carry


def save_state(path, carry, view=None):
    """Write carry (+ optional View camera state) to an npz."""
    flat = _flatten_carry(carry)
    extra = {"__version": np.asarray(SNAPSHOT_VERSION)}
    if view is not None:
        extra["__cam_pos"] = np.asarray(view.position)
        extra["__cam_rot"] = np.asarray(view.rotation)
        extra["__cam_frame"] = np.asarray(view.frame_index)
    np.savez_compressed(Path(path), **flat, **extra)


def load_state(path, view=None):
    """Returns the carry pytree (jnp arrays); patches `view` in place."""
    import jax.numpy as jnp
    z = np.load(Path(path), allow_pickle=False)
    assert int(z["__version"]) == SNAPSHOT_VERSION
    flat = {k: z[k] for k in z.files if not k.startswith("__")}
    carry = _unflatten_carry(flat)

    def to_dev(node):
        for k, v in node.items():
            if isinstance(v, dict):
                to_dev(v)
            elif isinstance(v, tuple):
                node[k] = tuple(jnp.asarray(x) for x in v)
            else:
                node[k] = jnp.asarray(v)
    to_dev(carry)
    if view is not None and "__cam_pos" in z.files:
        view.position = z["__cam_pos"].copy()
        view.rotation = z["__cam_rot"].copy()
        view.frame_index = int(z["__cam_frame"])
    return carry
