"""Checkpointing and resume.

Orbax-backed replacement for the reference's three-artifact scheme
(model-state-{epoch}.hdf5 / _weights.hdf5 / model-config.hdf5 + info.json,
/root/reference/mains/mj_trainUWYHGaitNet_DataGen_CasiaB.py:475-531) and its
resume scan `mj_findLatestFileModel` (/root/reference/utils/mj_netUtils.py:8-29):
one checkpoint per saved epoch under <experdir>/ckpt/<epoch>, plus
config.json written once (core/config.dump_json).

Also provides "surgery" restore — load a checkpoint whose classifier head
has a different class count, keeping every compatible weight (parity with
load_weights(by_name=True, skip_mismatch=True),
/root/reference/nets/mj_uwyhNets_ba.py:610-630).
"""

from __future__ import annotations

import os
import re
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


def _ckpt_root(experdir: str) -> str:
    return os.path.join(os.path.abspath(experdir), "ckpt")


def _step_dir(step) -> str:
    """Integer epochs plus the special 'best' slot
    (ModelCheckpoint(save_best_only=True) parity,
    /root/reference/mains/mj_trainUWYHGaitNet_DataGen_CasiaB.py:363-364)."""
    return "best" if step == "best" else str(int(step))


def save_checkpoint(experdir: str, step, state: Any) -> str:
    """Save a pytree (TrainState or params) at integer step/epoch or 'best'."""
    path = os.path.join(_ckpt_root(experdir), _step_dir(step))
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, jax.device_get(state), force=True)
    return path


class AsyncCheckpointWriter:
    """Non-blocking checkpoint saves (beyond reference — the reference's
    Keras ModelCheckpoint serializes h5 inline on the training thread).

    save() fetches the state to host (synchronous — the values must be
    read before training mutates the donated buffers) and hands the
    serialization + disk write to orbax's background thread, so the train
    loop resumes immediately.  Orbax itself serializes overlapping saves:
    a save() issued while the previous one is still writing blocks until
    it finishes — per-chunk cadences never interleave directories.

    wait() must run before reading a just-written checkpoint and before
    process exit (close() does both); Trainer calls it at fit() exit and
    the context-manager form covers scripts.
    """

    def __init__(self):
        self._ckptr = ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())

    def save(self, experdir: str, step, state: Any) -> str:
        path = os.path.join(_ckpt_root(experdir), _step_dir(step))
        self._ckptr.save(path, args=ocp.args.StandardSave(
            jax.device_get(state)), force=True)
        return path

    def wait(self) -> None:
        self._ckptr.wait_until_finished()

    def close(self) -> None:
        self._ckptr.close()  # waits, then releases the thread

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def has_best_checkpoint(experdir: str) -> bool:
    return os.path.isdir(os.path.join(_ckpt_root(experdir), "best"))


def latest_checkpoint_step(experdir: str, epoch_max: Optional[int] = None
                           ) -> Optional[int]:
    """Newest saved step <= epoch_max (mj_findLatestFileModel parity)."""
    root = _ckpt_root(experdir)
    if not os.path.isdir(root):
        return None
    steps = [int(d) for d in os.listdir(root) if re.fullmatch(r"\d+", d)]
    if epoch_max is not None:
        steps = [s for s in steps if s <= epoch_max]
    return max(steps) if steps else None


def restore_checkpoint(experdir: str, step, target: Any) -> Any:
    """Restore into the structure of `target` (same pytree layout)."""
    path = os.path.join(_ckpt_root(experdir), _step_dir(step))
    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(path, jax.device_get(target))


def restore_raw(experdir: str, step) -> Any:
    """Restore a checkpoint's raw pytree (TrainState or bare params) with
    no target structure — used by warm starts."""
    path = os.path.join(_ckpt_root(experdir), _step_dir(step))
    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(path)


def restore_params_surgery(experdir: str, step: int, target_params: Any
                           ) -> Any:
    """Restore params, keeping target's weights wherever shapes mismatch
    (classifier-head surgery when nclasses changes)."""
    path = os.path.join(_ckpt_root(experdir), _step_dir(step))
    with ocp.StandardCheckpointer() as ckptr:
        restored = ckptr.restore(path)
    return merge_matching(target_params, restored)


def merge_matching(target: Any, source: Any) -> Any:
    """Walk two nested dict trees by key, taking source leaves wherever the
    shapes match and keeping target's elsewhere (the Keras
    load_weights(by_name=True, skip_mismatch=True) semantics; shared by
    checkpoint surgery and utils/warm_start)."""
    if isinstance(target, dict):
        return {k: (merge_matching(v, source.get(k))
                    if isinstance(source, dict) else v)
                for k, v in target.items()}
    if isinstance(target, tuple) and not target:
        # empty containers (optax EmptyState) must survive as themselves —
        # the array path below would turn them into a (0,) ndarray and
        # corrupt the opt_state tree structure
        return target
    if (isinstance(target, (list, tuple)) and isinstance(source, (list, tuple))
            and any(isinstance(t, (dict, list, tuple)) for t in target)):
        # structured container subtrees (e.g. a restored opt_state that came
        # back as a list of dicts) must recurse element-wise — np.asarray on
        # a ragged container would silently keep the whole target subtree.
        # Flat numeric lists fall through to the array path below.
        if len(target) == len(source):
            merged = [merge_matching(t, s) for t, s in zip(target, source)]
            if isinstance(target, tuple):
                # NamedTuples (optax states like ScaleByAdamState) take N
                # field args, not one list
                return (type(target)(*merged)
                        if hasattr(target, "_fields") else tuple(merged))
            return merged
        return target
    if source is None:
        return target
    try:
        s = np.asarray(source)
        t = np.asarray(target)
        if s.shape == t.shape:
            return s.astype(t.dtype)
    except Exception:
        pass
    return target
