"""Fused Cascaded Group Attention kernel (EfficientViT hot spot).

The unfused CGA (models/efficientvit.py:CascadedGroupAttention) runs at
<1% MFU on TPU: per head it dispatches a 1x1 conv, a 5x5 depthwise, two
(N=49, kd=16) matmuls and a softmax over thousands of tiny windows, each
round-tripping HBM with layout changes (measured 3.4 ms of M0's 9.6 ms
batch at the stage-0 shape). Here ONE pallas_call keeps the whole cascade
in VMEM per block of G windows:

  * the window grid is zero-padded to WP = round_up(ws, 4) so every
    token-count is a sublane multiple (Mosaic rejects reshapes across a
    49-row boundary); padded tokens are zeroed before the depthwise conv
    (restoring the original zero padding ring) and masked with -1e9 bias
    as keys; padded-query outputs are garbage that the wrapper crops.
  * per head, the qkv projection is one (G*NP, c_in) MXU matmul, the
    ks x ks depthwise runs as shifted multiply-adds (VPU), and scores for
    all G windows are one batched dot_general + ONE softmax.
  * the cascade (head i's input = chunk_i + head i-1's output) stays a
    VMEM-resident loop.

BN is folded into the conv weights on the fly (inference path; training
keeps the reference module so batch statistics update).

MEASURED VERDICT (v5e, M0 stage-0 shape: 4096 windows of 7x7, bf16): the
kernel is bit-exact vs the module (maxdiff 0.0) but SLOWER — 5.76 ms vs
3.46 ms. Apportionment per variant: qkv+proj matmuls + HBM alone 1.58 ms,
+depthwise ~free (1.59), +attention 3.40, full 5.71. The per-window
(NP=64, kd=16) score/value dots lower to ~32k sequential tiny MXU ops per
batch (Mosaic loops the batch dim of dot_general) with 12.5% K-occupancy,
while the XLA path overlaps the same tiny ops with its HBM traffic.
Packing windows block-diagonally into bigger matmuls trades 8x redundant
FLOPs + 8x redundant softmax lanes and loses elsewhere. Gated OFF
(CascadedGroupAttention.use_pallas=False); kept as the measured record —
the same economics as the MBConv kernel (ops/pallas/mbconv.py).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(a: int, m: int) -> int:
    return (a + m - 1) // m * m


def padded_ws(ws: int) -> int:
    """Smallest WP >= ws with WP*WP a sublane (8) multiple."""
    return ws if (ws * ws) % 8 == 0 else _round_up(ws, 4)


def _kernel(x_ref, qmask_ref, wqkv_ref, bqkv_ref, dwk_ref, dwb_ref,
            bias_ref, wproj_ref, bproj_ref, out_ref, *, G: int, WP: int,
            heads: int, c_in: int, kd: int, d: int, ks_max: int):
    NP = WP * WP
    x = x_ref[...]                                       # (G, WP, WP, C)
    rows = x.reshape(G * NP, x.shape[-1])
    qmask = qmask_ref[...]                               # (NP, 1) fp32
    scale = float(kd) ** -0.5
    feat = rows[:, :c_in]
    outs = []
    for i in range(heads):
        if i > 0:
            feat = feat + rows[:, i * c_in:(i + 1) * c_in]
        qkv = jnp.dot(feat, wqkv_ref[i],
                      preferred_element_type=jnp.float32)
        qkv = (qkv + bqkv_ref[i]).astype(x.dtype)        # (G*NP, 2kd+d)

        # depthwise ks x ks on q; padded tokens are zeroed first so the
        # conv sees exactly the reference's zero ring around the window
        q = qkv[:, :kd].reshape(G, NP, kd)
        q = (q * qmask.astype(x.dtype)).reshape(G, WP, WP, kd)
        pad = ks_max // 2
        qp = jnp.pad(q, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
        acc = jnp.zeros((G, WP, WP, kd), jnp.float32) + dwb_ref[i]
        for dy in range(ks_max):
            for dx in range(ks_max):
                acc += (qp[:, dy:dy + WP, dx:dx + WP, :]
                        .astype(jnp.float32) * dwk_ref[i, dy, dx, :])
        q = (acc * scale).astype(x.dtype).reshape(G, NP, kd)

        k = qkv[:, kd:2 * kd].reshape(G, NP, kd)
        v = qkv[:, 2 * kd:].reshape(G, NP, d)
        s = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)          # (G, NP, NP)
        s = s + bias_ref[i][None]                        # -1e9 on pad keys
        s = jax.nn.softmax(s, axis=-1).astype(x.dtype)
        o = jax.lax.dot_general(
            s, v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32).astype(x.dtype)  # (G,NP,d)
        feat = o.reshape(G * NP, d)
        outs.append(o)

    cat = jax.nn.relu(jnp.concatenate(outs, axis=-1))    # (G, NP, h*d)
    y = jnp.dot(cat.reshape(G * NP, heads * d), wproj_ref[...],
                preferred_element_type=jnp.float32) + bproj_ref[...]
    out_ref[...] = y.astype(out_ref.dtype).reshape(G, WP, WP, -1)


def _pick_g(n_windows: int, np_tokens: int) -> int | None:
    # ~4k rows/step keeps the per-step footprint (scores + qkv + cascade
    # buffers) under the 16M scoped-VMEM limit with double buffering
    target = max(1, 4096 // np_tokens)
    for g in range(min(target, n_windows), 0, -1):
        if n_windows % g == 0:
            return g
    return None


def supports_shape(n_windows: int, ws: int) -> bool:
    return ws <= 16 and _pick_g(n_windows, padded_ws(ws) ** 2) is not None


def fused_cga(x: jnp.ndarray, biases: jnp.ndarray, idxs, wqkv, bqkv, dwk,
              dwb, wproj, bproj, *, ws: int, heads: int, c_in: int, kd: int,
              d: int, ks_max: int, interpret: bool = False) -> jnp.ndarray:
    """Call under jit (the model's apply) — `idxs` is a HOST-side numpy
    constant folded into the trace.

    x (Nw, ws, ws, C); biases (h, n_off) learned table; idxs (N, N)
    constant bucket ids (models/efficientvit.py:attention_bias_indices);
    wqkv (h, c_in, 2kd+d); dwk (h, ks_max, ks_max, kd) fp32 (smaller
    per-head kernels zero-padded, centered); wproj (h*d, C); bproj (C,).
    BN pre-folded. Returns (Nw, ws, ws, C)."""
    Nw, _, _, C = x.shape
    N = ws * ws
    WP = padded_ws(ws)
    NP = WP * WP
    G = _pick_g(Nw, NP)

    # remap the (N, N) bias table onto the padded grid: token (y, x) moves
    # from y*ws+x to y*WP+x; pad tokens point at a sentinel bucket whose
    # value is -1e9 (key masking). Host-side numpy — constants under jit.
    idxs = np.asarray(idxs)
    n_off = int(biases.shape[1])
    idxs_p = np.full((NP, NP), n_off, np.int64)
    tok = (np.arange(ws)[:, None] * WP + np.arange(ws)[None, :]).ravel()
    idxs_p[np.ix_(tok, tok)] = idxs
    biases_ext = jnp.concatenate(
        [biases.astype(jnp.float32),
         jnp.full((heads, 1), -1e9, jnp.float32)], axis=1)
    bias_p = biases_ext[:, idxs_p]                       # (h, NP, NP)

    qmask = np.zeros((NP, 1), np.float32)
    qmask[tok] = 1.0

    if WP != ws:
        x = jnp.pad(x, ((0, 0), (0, WP - ws), (0, WP - ws), (0, 0)))

    def spec(shape, idx=None):
        return pl.BlockSpec(shape, idx or (lambda b: (0,) * len(shape)),
                            memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        functools.partial(_kernel, G=G, WP=WP, heads=heads, c_in=c_in,
                          kd=kd, d=d, ks_max=ks_max),
        out_shape=jax.ShapeDtypeStruct((Nw, WP, WP, C), x.dtype),
        grid=(Nw // G,),
        in_specs=[
            spec((G, WP, WP, C), lambda b: (b, 0, 0, 0)),
            spec((NP, 1)), spec(wqkv.shape), spec(bqkv.shape),
            spec(dwk.shape), spec(dwb.shape), spec(bias_p.shape),
            spec(wproj.shape), spec(bproj.shape),
        ],
        out_specs=spec((G, WP, WP, C), lambda b: (b, 0, 0, 0)),
        interpret=interpret,
    )(x, jnp.asarray(qmask), wqkv, bqkv, dwk, dwb, bias_p, wproj, bproj)
    return out[:, :ws, :ws, :]


def fold_cga_variables(v: dict, heads: int, kd: int, d: int, ks_max: int,
                       compute_dtype):
    """CascadedGroupAttention variables -> fused-kernel operands: per-head
    qkv/dw/proj ConvBNs folded, per-head depthwise kernels zero-padded +
    centered into the ks_max buffer."""
    from cream_tpu.ops.pallas.mbconv import fold_convbn

    p, s = v["params"], v["batch_stats"]

    def fold(name):
        return fold_convbn(p[name]["conv"]["kernel"].astype(jnp.float32),
                           p[name]["bn"]["scale"].astype(jnp.float32),
                           p[name]["bn"]["bias"].astype(jnp.float32),
                           s[name]["bn"]["mean"].astype(jnp.float32),
                           s[name]["bn"]["var"].astype(jnp.float32))

    wqkv, bqkv, dwk, dwb = [], [], [], []
    for i in range(heads):
        kq, bq = fold(f"qkv_{i}")                        # (1,1,c_in,2kd+d)
        wqkv.append(kq[0, 0])
        bqkv.append(bq)
        kdw, bdw = fold(f"dw_{i}")                       # (ks,ks,1,kd)
        ks = kdw.shape[0]
        off = (ks_max - ks) // 2
        buf = jnp.zeros((ks_max, ks_max, kd), jnp.float32)
        buf = buf.at[off:off + ks, off:off + ks, :].set(kdw[:, :, 0, :])
        dwk.append(buf)
        dwb.append(bdw)
    kp, bp = fold("proj")                                # (1,1,h*d,C)
    return (jnp.stack(wqkv).astype(compute_dtype), jnp.stack(bqkv),
            jnp.stack(dwk), jnp.stack(dwb),
            kp[0, 0].astype(compute_dtype), bp)
