"""Pallas TPU kernel: the CGA attention core with windows packed into one GEMM.

Round-4 M0 xplane attribution (bs1024 eval, 10.86 ms/step) localizes ~3.2 ms
in the CascadedGroupAttention math: the fp32 (4096, 49, 49) score tensors
round-trip HBM between the QK einsum, the bias add and the softmax, and XLA
lays them out {1,2,0} so three of the four stage-0 softmaxes run as ~156 GB/s
strided reduces (0.515 ms each vs 0.186 for the one that stays on-chip).

Why not the whole-cascade kernel: ops/pallas/cga.py measured SLOWER than XLA
(5.76 vs 3.46 ms) because fusing the per-head qkv/dw convs in-kernel turns
batched tiny dots into ~32k sequential MXU ops. This kernel keeps every conv
in XLA (where the op-level pipeline overlaps them with HBM) and replaces ONLY
the score/bias/softmax/PV chain, per head.

The packing trick: one window's attention is a (N, N) = (49, 49) dot — a
~50ns MXU op dwarfed by its issue overhead, and 4096 of them serialize. So G
windows are stacked along the row dim and attention becomes ONE
(G*N, kd) @ (kd, G*N) GEMM whose off-diagonal (cross-window) blocks are
masked to -1e9 through the bias operand. The compute inflation (G-fold on
the two dots) is paid at full-MXU rates and is still ~an order below the HBM
round-trips it deletes; the softmax runs VMEM-resident over the whole block.
The masked bias is built once per head in XLA ((G*N, G*N) fp32, block-diag
tiles of the per-head (N, N) relative-position table) and its BlockSpec index
map is constant, so Mosaic DMAs it exactly once for the whole grid.

Reference semantics matched: EfficientViT/classification/model/efficientvit.py
CascadedGroupAttention.forward (attn = q@k^T * scale + bias; softmax; @v).
Forward-only: callers gate on eval (train keeps the XLA einsum path, whose
backward XLA already schedules well).

ROUND-4 VERDICT (measured, v5e, tools/cga_ab.py): LOSES — M0 bs1024 eval
77,351 img/s with the kernel vs 107,178 for the XLA einsum chain (10.9 ms
vs 9.6 ms/step... a +3.7 ms regression at the bench batch). The packing's
costs are structural, not tunable: (a) masking cross-window blocks through
the bias makes every softmax pass (max/exp/sum/div) run over G=16x more
positions than the real attention — ~157M exps/step vs 9.8M — all VPU
serial work inside the kernel; (b) the (G*N, kd)@(kd, G*N) score dot has a
kd=16 contraction against the MXU's 128-deep array (~8x underfill), so the
G-fold FLOP inflation is paid at ~1/8 rate; (c) the (G*N, G*N) fp32 masked
bias adds a 2.4 MB VMEM resident per head. N=49 forces G=16 exactly (the
only G with G*49 sublane-aligned), so there is no smaller-G variant to
tune toward. Gated off (DEFAULT_CORE_KERNEL=False); kernel + parity tests
kept as the recorded experiment. This is the second measured negative on
M0's dispatch-boundedness (after the whole-cascade kernel, ops/pallas/cga.py)
— both confirm CLAUDE.md's fuse-or-not doctrine: XLA's op-level pipeline
already overlaps the tiny-head chains with HBM; in-kernel forms serialize
them and pay masked-position or underfill taxes on top.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

# A/B knob for the eval path (CascadedGroupAttention checks it).
# Measured loser (see module docstring) — off by default.
DEFAULT_CORE_KERNEL = False


def _kernel(q_ref, k_ref, v_ref, bias_ref, out_ref, *, scale: float):
    s = jax.lax.dot_general(q_ref[...], k_ref[...], (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    s = s * scale + bias_ref[...]
    s = s - jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s)
    p = (p / jnp.sum(p, axis=-1, keepdims=True)).astype(v_ref.dtype)
    out_ref[...] = jax.lax.dot_general(
        p, v_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(out_ref.dtype)


def pick_block_windows(n_win: int, n_tok: int) -> int | None:
    """Largest G with G*N a bf16 sublane-tile multiple (16), G | n_win, and
    G*N <= 784 (VMEM: fp32 score block + masked bias stay ~2.5 MB each)."""
    best = None
    g = 1
    while g <= n_win and g * n_tok <= 784:
        if n_win % g == 0 and (g * n_tok) % 16 == 0:
            best = g
        g *= 2
    return best


def supports(n_win: int, n_tok: int) -> bool:
    return pick_block_windows(n_win, n_tok) is not None


@functools.partial(jax.jit, static_argnames=("scale", "interpret"))
def cga_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                  bias: jnp.ndarray, scale: float,
                  interpret: bool = False) -> jnp.ndarray:
    """q, k: (W, N, kd); v: (W, N, d); bias: (N, N) fp32 (already gathered for
    this head). Returns softmax(q@k^T * scale + bias) @ v as (W, N, d)."""
    W, N, kd = q.shape
    d = v.shape[-1]
    G = pick_block_windows(W, N)
    if G is None:
        raise ValueError(f"unsupported shape: {W} windows of {N} tokens")
    R = G * N
    # (W, N, c) -> (W*N, c) is a row-major bitcast; never a relayout.
    q2, k2, v2 = (t.reshape(W * N, t.shape[-1]) for t in (q, k, v))
    blockdiag = np.equal.outer(np.arange(R) // N, np.arange(R) // N)
    big_bias = jnp.where(jnp.asarray(blockdiag),
                         jnp.tile(bias.astype(jnp.float32), (G, G)),
                         jnp.float32(-1e9))
    out = pl.pallas_call(
        functools.partial(_kernel, scale=scale),
        grid=(W // G,),
        in_specs=[pl.BlockSpec((R, kd), lambda i: (i, 0)),
                  pl.BlockSpec((R, kd), lambda i: (i, 0)),
                  pl.BlockSpec((R, d), lambda i: (i, 0)),
                  pl.BlockSpec((R, R), lambda i: (0, 0))],
        out_specs=pl.BlockSpec((R, d), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((W * N, d), q.dtype),
        interpret=interpret,
    )(q2, k2, v2, big_bias)
    return out.reshape(W, N, d)
