# Pytree checkpointing with a latest-manifest and bounded retention.
#
# Functional equivalent of the reference's checkpoint scheme
# (ref: my_torchlib/utils.py:25-67): numbered `%07d.ckpt` files, a
# `latest_checkpoint` manifest, deletion beyond max_keep, resume from the
# manifest — but storing JAX pytrees (params/opt states) via flax
# serialization instead of torch state dicts.

from __future__ import annotations

import os
from typing import Any, Optional, Tuple

import flax.serialization
import jax

MANIFEST = 'latest_checkpoint'


def _ckpt_name(step: int) -> str:
    return '%07d.ckpt' % step


def save_checkpoint(ckpt_dir: str, pytree: Any, step: int,
                    max_keep: int = 2) -> str:
    """Serialise `pytree` to <dir>/%07d.ckpt, update the manifest, GC old."""
    os.makedirs(ckpt_dir, exist_ok=True)
    pytree = jax.device_get(pytree)
    name = _ckpt_name(step)
    path = os.path.join(ckpt_dir, name)
    with open(path, 'wb') as f:
        f.write(flax.serialization.to_bytes(pytree))

    manifest_path = os.path.join(ckpt_dir, MANIFEST)
    existing = []
    if os.path.exists(manifest_path):
        with open(manifest_path) as f:
            existing = [l.strip() for l in f.readlines()[1:] if l.strip()]
    existing = [e for e in existing if e != name] + [name]
    while len(existing) > max_keep:
        victim = existing.pop(0)
        vp = os.path.join(ckpt_dir, victim)
        if os.path.exists(vp):
            os.remove(vp)
    with open(manifest_path, 'w') as f:
        f.write(name + '\n')
        f.write('\n'.join(existing) + '\n')
    return path


def latest_checkpoint_path(ckpt_dir: str) -> Optional[str]:
    manifest_path = os.path.join(ckpt_dir, MANIFEST)
    if not os.path.exists(manifest_path):
        return None
    with open(manifest_path) as f:
        name = f.readline().strip()
    path = os.path.join(ckpt_dir, name)
    return path if os.path.exists(path) else None


def load_checkpoint(ckpt_dir: str, target: Any) -> Optional[Tuple[Any, int]]:
    """Restore the newest checkpoint into `target`'s structure.

    Returns (pytree, step) or None when no checkpoint exists — callers fall
    back to fresh init, mirroring the reference's try/except resume
    (ref: color_texture_branch/train.py:67-88).
    """
    path = latest_checkpoint_path(ckpt_dir)
    if path is None:
        return None
    with open(path, 'rb') as f:
        data = f.read()
    restored = flax.serialization.from_bytes(target, data)
    step = int(os.path.splitext(os.path.basename(path))[0])
    return restored, step
