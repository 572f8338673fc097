"""Weight inheritance: initialize a small CLIP student from a larger teacher.

Rebuild of TinyCLIP/src/open_clip/weight_inherit.py:71-138 on flax trees:
  * depth remap 'interval_front': student layer i takes teacher layer
    i * (teacher_depth // student_depth)  (:79-99)
  * width: front-slice every tensor to the student shape (prune_param :54-61)
  * qkv kernels are sliced head-aware: (in, 3*H*hd) viewed as
    (in, 3, H, hd), keeping the first student heads (:101-117)
"""
from __future__ import annotations

import re

import jax
import numpy as np


_BLOCK_RE = re.compile(r"resblocks_(\d+)")


def _front_slice(teacher: np.ndarray, shape: tuple) -> np.ndarray:
    if teacher.shape == tuple(shape):
        return teacher
    sl = tuple(slice(0, s) for s in shape)
    out = teacher[sl]
    assert out.shape == tuple(shape), (teacher.shape, shape)
    return out


def _slice_qkv_kernel(teacher: np.ndarray, shape: tuple, head_dim: int
                      ) -> np.ndarray:
    t_in, t_out = teacher.shape
    s_in, s_out = shape
    t_heads = t_out // (3 * head_dim)
    s_heads = s_out // (3 * head_dim)
    v = teacher.reshape(t_in, 3, t_heads, head_dim)
    return v[:s_in, :, :s_heads].reshape(s_in, 3 * s_heads * head_dim)


def _slice_qkv_bias(teacher: np.ndarray, shape: tuple, head_dim: int
                    ) -> np.ndarray:
    t_heads = teacher.shape[0] // (3 * head_dim)
    s_heads = shape[0] // (3 * head_dim)
    return teacher.reshape(3, t_heads, head_dim)[:, :s_heads].reshape(-1)


def _tree_depth(flat: dict) -> int:
    mx = -1
    for k in flat:
        m = _BLOCK_RE.search(k)
        if m:
            mx = max(mx, int(m.group(1)))
    return mx + 1


def weight_inherit(student_shapes, teacher_params, head_dim: int = 64) -> dict:
    """student_shapes: a pytree of arrays or ShapeDtypeStructs (the student's
    initialized params). teacher_params: the teacher's params pytree.
    Returns a student params pytree inherited from the teacher."""
    import flax

    s_flat = flax.traverse_util.flatten_dict(
        jax.tree_util.tree_map(lambda a: a, student_shapes), sep="/")
    t_flat = {k: np.asarray(v) for k, v in flax.traverse_util.flatten_dict(
        teacher_params, sep="/").items()}

    # depth remap per tower prefix
    def remap_key(key: str) -> str:
        m = _BLOCK_RE.search(key)
        if not m:
            return key
        prefix = key[:m.start()]
        s_depth = max(int(_BLOCK_RE.search(k).group(1)) + 1
                      for k in s_flat if k.startswith(prefix)
                      and _BLOCK_RE.search(k))
        t_depth = max(int(_BLOCK_RE.search(k).group(1)) + 1
                      for k in t_flat if k.startswith(prefix)
                      and _BLOCK_RE.search(k))
        step = max(t_depth // max(s_depth, 1), 1)
        i = int(m.group(1))
        return key[:m.start()] + f"resblocks_{i * step}" + key[m.end():]

    out = {}
    for key, s_val in s_flat.items():
        shape = tuple(s_val.shape)
        t_key = remap_key(key)
        if t_key not in t_flat:
            raise KeyError(f"teacher missing {t_key} for student {key}")
        t_val = t_flat[t_key]
        if "in_proj" in key and key.endswith("kernel"):
            out[key] = _slice_qkv_kernel(t_val, shape, head_dim)
        elif "in_proj" in key and key.endswith("bias"):
            out[key] = _slice_qkv_bias(t_val, shape, head_dim)
        else:
            out[key] = _front_slice(t_val, shape)
    return flax.traverse_util.unflatten_dict(
        {tuple(k.split("/")): v for k, v in out.items()})
