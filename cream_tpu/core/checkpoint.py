"""Checkpointing: orbax save/restore of TrainState-shaped pytrees + auto-resume.

Replaces the reference's per-project save_checkpoint/load_checkpoint/
auto_resume_helper (TinyViT/utils.py:57-275, MiniViT/Mini-Swin/utils.py:218)
and search-state checkpoints (AutoFormer/evolution.py:51-75). Checkpoints are
sharding-aware (orbax restores onto whatever mesh the state is created with),
so resume works across different device counts — something the reference's
rank-0 .pth files cannot do.
"""
from __future__ import annotations

import os
import re
from typing import Any

import orbax.checkpoint as ocp


def _manager(ckpt_dir: str, max_to_keep: int = 3) -> ocp.CheckpointManager:
    return ocp.CheckpointManager(
        os.path.abspath(ckpt_dir),
        options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep,
                                             create=True))


def save_checkpoint(ckpt_dir: str, step: int, state: Any,
                    extra: dict | None = None, max_to_keep: int = 3):
    """state: any pytree (e.g. TrainState); extra: small JSON-able metadata.

    When state carries a `.params` attribute it is additionally saved under a
    separate 'params' entry so consumers (evolution search, eval, teacher
    loading) can restore weights WITHOUT reconstructing the optimizer tree —
    the reference's 'one supernet ckpt serves all subnets' usage
    (AutoFormer/evolution.py:537-544)."""
    with _manager(ckpt_dir, max_to_keep) as mngr:
        args = {"state": ocp.args.StandardSave(state)}
        if hasattr(state, "params"):
            args["params"] = ocp.args.StandardSave(state.params)
        if extra:
            args["extra"] = ocp.args.JsonSave(extra)
        mngr.save(step, args=ocp.args.Composite(**args))
        mngr.wait_until_finished()


class AsyncCheckpointer:
    """Persistent manager whose saves run in the background (orbax's async
    save path) so checkpoint IO overlaps the next training steps — the
    reference blocks its loop on torch.save (TinyViT/utils.py:57);
    wait_until_finished happens lazily before the NEXT save (orbax serializes
    overlapping saves itself) and on close().

    Usage: ck = AsyncCheckpointer(dir); ck.save(step, state, extra); ...;
    ck.close()  (or use as a context manager).
    """

    def __init__(self, ckpt_dir: str, max_to_keep: int = 3):
        self._mngr = _manager(ckpt_dir, max_to_keep)

    def save(self, step: int, state: Any, extra: dict | None = None):
        args = {"state": ocp.args.StandardSave(state)}
        if hasattr(state, "params"):
            args["params"] = ocp.args.StandardSave(state.params)
        if extra:
            args["extra"] = ocp.args.JsonSave(extra)
        self._mngr.save(step, args=ocp.args.Composite(**args))

    def wait(self):
        self._mngr.wait_until_finished()

    def close(self):
        self._mngr.wait_until_finished()
        self._mngr.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def restore_params(ckpt_dir: str, abstract_params: Any,
                   step: int | None = None) -> Any:
    """Restore only the params tree saved by save_checkpoint."""
    if step is None:
        step = latest_step(ckpt_dir)
    if step is None:
        raise FileNotFoundError(f"no checkpoint under {ckpt_dir}")
    with _manager(ckpt_dir) as mngr:
        restored = mngr.restore(step, args=ocp.args.Composite(
            params=ocp.args.StandardRestore(abstract_params)))
    return restored["params"]


def latest_step(ckpt_dir: str) -> int | None:
    """auto_resume_helper equivalent: newest step in the directory, or None."""
    if not os.path.isdir(ckpt_dir):
        return None
    steps = [int(d) for d in os.listdir(ckpt_dir) if re.fullmatch(r"\d+", d)]
    return max(steps) if steps else None


def restore_checkpoint(ckpt_dir: str, abstract_state: Any,
                       step: int | None = None) -> tuple[Any, dict | None, int]:
    """Restore (state, extra, step). abstract_state: a pytree of the same
    structure (concrete or jax.eval_shape output) guiding restoration."""
    if step is None:
        step = latest_step(ckpt_dir)
    if step is None:
        raise FileNotFoundError(f"no checkpoint under {ckpt_dir}")
    with _manager(ckpt_dir) as mngr:
        restored = mngr.restore(
            step, args=ocp.args.Composite(
                state=ocp.args.StandardRestore(abstract_state)))
    extra = None
    extra_path = os.path.join(ckpt_dir, str(step), "extra")
    if os.path.isdir(extra_path):
        with _manager(ckpt_dir) as mngr:
            extra = mngr.restore(step, args=ocp.args.Composite(
                extra=ocp.args.JsonRestore()))["extra"]
    return restored["state"], extra, step
