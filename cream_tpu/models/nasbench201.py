"""NAS-Bench-201 search space (CDARTS/benchmark201).

TPU-native rebuild of CDARTS/benchmark201/models/{ops.py,search_cells.py,
cdarts_controller.py} and utils/genotypes.py:Structure. The 201 cell is a
4-node DAG where EVERY edge i<-j (6 edges, lexicographic '1<-0','2<-0',
'2<-1','3<-0','3<-1','3<-2' order) carries one of 5 ops; the macro skeleton
is stem -> N cells -> ResNetBasicblock(stride 2) -> N cells -> basicblock ->
N cells -> GAP -> head, with ONE shared alpha matrix (6, 5) for all cells
(reductions are fixed ResNet blocks, so there is no reduce-alpha set).

NHWC; alphas are TRACED inputs so search shares a single compiled program
(the repo-wide supernet convention). The search net keeps the DARTS-space
`(x, alphas_normal, alphas_reduce)` calling convention so nas/cdarts.py's
CyclicSearcher and the multi-stage driver drive it unchanged — 201 simply
ignores the reduce set.
"""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from cream_tpu.models.registry import register_model

Dtype = Any

NB201_OPS = ("none", "skip_connect", "nor_conv_1x1", "nor_conv_3x3",
             "avg_pool_3x3")
EDGES = tuple((i, j) for i in range(1, 4) for j in range(i))  # lexicographic
N_EDGES = len(EDGES)                                          # 6


def _bn(dtype, name, train, affine=True):
    return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                        epsilon=1e-5, dtype=dtype, name=name,
                        use_bias=affine, use_scale=affine)


class ReLUConvBN(nn.Module):
    """relu -> conv -> BN (ops.py:30-41)."""
    C_out: int
    kernel: int
    stride: int = 1
    affine: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        x = jax.nn.relu(x)
        x = nn.Conv(self.C_out, (self.kernel,) * 2,
                    strides=(self.stride,) * 2,
                    padding=self.kernel // 2, use_bias=False,
                    dtype=self.dtype, name="conv")(x)
        return _bn(self.dtype, "bn", train, self.affine)(x)


class ResNetBasicblock(nn.Module):
    """Fixed reduction block between stages (ops.py:71-105)."""
    planes: int
    stride: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        h = ReLUConvBN(self.planes, 3, self.stride, affine=True,
                       dtype=self.dtype, name="conv_a")(x, train)
        h = ReLUConvBN(self.planes, 3, 1, affine=True, dtype=self.dtype,
                       name="conv_b")(h, train)
        if self.stride == 2:
            r = nn.avg_pool(x, (2, 2), (2, 2))
            r = nn.Conv(self.planes, (1, 1), use_bias=False,
                        dtype=self.dtype, name="downsample")(r)
        elif x.shape[-1] != self.planes:
            r = ReLUConvBN(self.planes, 1, 1, affine=True, dtype=self.dtype,
                           name="downsample")(x, train)
        else:
            r = x
        return r + h


def _apply_op(op: str, x, C: int, stride: int, dtype, name, train):
    if op == "none":
        if stride == 1:
            return jnp.zeros_like(x)
        return jnp.zeros_like(x[:, ::stride, ::stride])
    if op == "skip_connect":
        return x                                 # stride is always 1 here
    if op == "avg_pool_3x3":
        return nn.avg_pool(x, (3, 3), (stride,) * 2,
                           padding=((1, 1), (1, 1)),
                           count_include_pad=True)
    k = {"nor_conv_1x1": 1, "nor_conv_3x3": 3, "nor_conv_7x7": 7}[op]
    return ReLUConvBN(C, k, stride, dtype=dtype, name=name)(x, train)


class Cell201(nn.Module):
    """Search cell (search_cells.py:9-45): node i = sum_j sum_ops
    w[edge(i,j), op] * op(node_j). All edges stride 1 inside the 201 space
    (reductions live in the fixed ResNet blocks)."""
    C: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, weights, train=False):
        nodes = [x]
        for i in range(1, 4):
            acc = None
            for j in range(i):
                e = EDGES.index((i, j))
                for oi, op in enumerate(NB201_OPS):
                    y = _apply_op(op, nodes[j], self.C, 1, self.dtype,
                                  f"edge{i}_{j}_op{oi}", train)
                    term = weights[e, oi] * y
                    acc = term if acc is None else acc + term
            nodes.append(acc)
        return nodes[-1]


class InferCell201(nn.Module):
    """Discretized cell for a fixed genotype (cell_infers semantics):
    genotype = tuple over nodes 1..3 of tuples of (op_name, in_node)."""
    genotype: tuple
    C: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        nodes = [x]
        for ni, node_info in enumerate(self.genotype, start=1):
            acc = None
            for (op, j) in node_info:
                y = _apply_op(op, nodes[j], self.C, 1, self.dtype,
                              f"edge{ni}_{j}_{op}", train)
                acc = y if acc is None else acc + y
            nodes.append(jnp.zeros_like(nodes[0]) if acc is None else acc)
        return nodes[-1]


class TinyNetwork201(nn.Module):
    """Search network: one shared (6, 5) alpha matrix for every cell.
    Signature matches SearchCNN so CyclicSearcher drives it unchanged
    (alphas_reduce is accepted and ignored)."""
    num_classes: int = 10
    C: int = 16
    N: int = 5                                    # cells per stage
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, alphas_normal, alphas_reduce=None, train=False):
        w = jax.nn.softmax(alphas_normal, -1)
        x = nn.Conv(self.C, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype, name="stem_conv")(x)
        x = _bn(self.dtype, "stem_bn", train)(x)
        C = self.C
        idx = 0
        for stage in range(3):
            if stage > 0:
                C *= 2
                x = ResNetBasicblock(C, 2, dtype=self.dtype,
                                     name=f"reduction_{stage}")(x, train)
            for _ in range(self.N):
                x = Cell201(C, dtype=self.dtype,
                            name=f"cell_{idx}")(x, w, train)
                idx += 1
        x = jax.nn.relu(_bn(self.dtype, "lastact_bn", train)(x))
        x = x.mean(axis=(1, 2))
        return nn.Dense(self.num_classes, dtype=self.dtype, name="head")(x)


class TinyNetwork201Infer(nn.Module):
    """Evaluation/retrain network for a discretized genotype."""
    genotype: tuple
    num_classes: int = 10
    C: int = 16
    N: int = 5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        x = nn.Conv(self.C, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype, name="stem_conv")(x)
        x = _bn(self.dtype, "stem_bn", train)(x)
        C = self.C
        idx = 0
        for stage in range(3):
            if stage > 0:
                C *= 2
                x = ResNetBasicblock(C, 2, dtype=self.dtype,
                                     name=f"reduction_{stage}")(x, train)
            for _ in range(self.N):
                x = InferCell201(self.genotype, C, dtype=self.dtype,
                                 name=f"cell_{idx}")(x, train)
                idx += 1
        x = jax.nn.relu(_bn(self.dtype, "lastact_bn", train)(x))
        x = x.mean(axis=(1, 2))
        return nn.Dense(self.num_classes, dtype=self.dtype, name="head")(x)


def init_alphas_201(rng: jax.Array, scale: float = 1e-3) -> dict:
    """{'normal': (6,5), 'reduce': (6,5)} — reduce is a dummy twin kept for
    the shared CyclicSearcher interface."""
    a = scale * jax.random.normal(rng, (N_EDGES, len(NB201_OPS)))
    return {"normal": a, "reduce": jnp.zeros_like(a)}


def parse_structure(alphas) -> tuple:
    """argmax-per-edge discretization -> genotype tuple
    (cdarts_controller.py:332-344)."""
    a = np.asarray(alphas["normal"] if isinstance(alphas, dict) else alphas)
    genotype = []
    for i in range(1, 4):
        node = []
        for j in range(i):
            e = EDGES.index((i, j))
            node.append((NB201_OPS[int(a[e].argmax())], j))
        genotype.append(tuple(node))
    return tuple(genotype)


def structure_tostr(genotype: tuple) -> str:
    """The canonical NAS-Bench-201 arch string
    (utils/genotypes.py:Structure.tostr):
    '|op~0|+|op~0|op~1|+|op~0|op~1|op~2|'."""
    return "+".join(
        "|" + "|".join(f"{op}~{j}" for op, j in node) + "|"
        for node in genotype)


def structure_fromstr(xstr: str) -> tuple:
    """Inverse of structure_tostr (utils/genotypes.py:str2structure)."""
    genotype = []
    for node_str in xstr.split("+"):
        inputs = [s for s in node_str.split("|") if s]
        node = []
        for inp in inputs:
            op, j = inp.rsplit("~", 1)
            node.append((op, int(j)))
        genotype.append(tuple(node))
    return tuple(genotype)


def structure_check_valid(genotype: tuple) -> bool:
    """A net is valid if the output node is reachable through non-'none' ops
    (Structure.check_valid)."""
    reachable = {0: True}
    for i, node in enumerate(genotype, start=1):
        reachable[i] = any(op != "none" and reachable[j] for op, j in node)
    return reachable[len(genotype)]


@register_model
def nasbench201_search(num_classes: int = 10, C: int = 16, N: int = 5,
                       dtype=jnp.float32, **kw):
    return TinyNetwork201(num_classes=num_classes, C=C, N=N, dtype=dtype,
                          **kw)


@register_model
def nasbench201_infer(genotype, num_classes: int = 10, C: int = 16,
                      N: int = 5, dtype=jnp.float32, **kw):
    if isinstance(genotype, str):
        genotype = structure_fromstr(genotype)
    return TinyNetwork201Infer(genotype=genotype, num_classes=num_classes,
                               C=C, N=N, dtype=dtype, **kw)
