"""DARTS cells + networks (CDARTS model layer).

Rebuild of CDARTS/lib/models/{ops.py,search_cells.py,augment_cells.py,
model_augment.py} and lib/utils/genotypes.py on NHWC flax:
  * the 8-primitive search space (ops.py:24-33)
  * MixedOp continuous relaxation, SearchCell DAG with edge weights
    (search_cells.py:43-53)
  * genotype decode (top-2 incoming edges per node, best non-'none' op)
  * discrete AugmentCell / AugmentCNN for retraining a found genotype

Search alphas are NOT module parameters — they live in the search driver's
own pytree (nas/cdarts.py), the functional equivalent of the reference
keeping alphas on the controller.
"""
from __future__ import annotations

from typing import Any, NamedTuple, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from cream_tpu.models.registry import register_model
from cream_tpu.nn.layers import ConvBN

Dtype = Any

PRIMITIVES = ("max_pool_3x3", "avg_pool_3x3", "skip_connect", "sep_conv_3x3",
              "sep_conv_5x5", "dil_conv_3x3", "dil_conv_5x5", "none")


class Genotype(NamedTuple):
    normal: list
    normal_concat: list
    reduce: list
    reduce_concat: list


class StdConv(nn.Module):
    """ReLU - Conv - BN (ops.py StdConv)."""
    C_out: int
    kernel: int = 1
    stride: int = 1
    padding: int = 0
    affine: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        x = nn.relu(x)
        return ConvBN(self.C_out, self.kernel, self.stride, self.padding,
                      dtype=self.dtype, name="conv_bn")(x, train)


class FactorizedReduce(nn.Module):
    """ReLU, two offset stride-2 1x1 convs concatenated, BN."""
    C_out: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        x = nn.relu(x)
        a = nn.Conv(self.C_out // 2, (1, 1), strides=(2, 2), use_bias=False,
                    dtype=self.dtype, name="conv1")(x)
        b = nn.Conv(self.C_out - self.C_out // 2, (1, 1), strides=(2, 2),
                    use_bias=False, dtype=self.dtype,
                    name="conv2")(x[:, 1:, 1:, :])
        x = jnp.concatenate([a, b], axis=-1)
        return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                            epsilon=1e-5, dtype=self.dtype, name="bn")(x)


class SepConv(nn.Module):
    """(ReLU - dwConv - pwConv - BN) x 2."""
    C: int
    kernel: int
    stride: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        p = self.kernel // 2
        for i, s in enumerate((self.stride, 1)):
            x = nn.relu(x)
            x = nn.Conv(self.C, (self.kernel, self.kernel), strides=(s, s),
                        padding=[(p, p)] * 2, feature_group_count=self.C,
                        use_bias=False, dtype=self.dtype, name=f"dw{i}")(x)
            x = nn.Conv(self.C, (1, 1), use_bias=False, dtype=self.dtype,
                        name=f"pw{i}")(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=self.dtype, name=f"bn{i}")(x)
        return x


class DilConv(nn.Module):
    """ReLU - dilated dwConv - pwConv - BN."""
    C: int
    kernel: int
    stride: int
    dilation: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        p = self.dilation * (self.kernel // 2)
        x = nn.relu(x)
        x = nn.Conv(self.C, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride), padding=[(p, p)] * 2,
                    kernel_dilation=(self.dilation, self.dilation),
                    feature_group_count=self.C, use_bias=False,
                    dtype=self.dtype, name="dw")(x)
        x = nn.Conv(self.C, (1, 1), use_bias=False, dtype=self.dtype,
                    name="pw")(x)
        return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                            epsilon=1e-5, dtype=self.dtype, name="bn")(x)


class PoolBN(nn.Module):
    mode: str
    stride: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        s = self.stride
        if self.mode == "max":
            x = nn.max_pool(x, (3, 3), strides=(s, s), padding=[(1, 1)] * 2)
        else:
            x = nn.avg_pool(x, (3, 3), strides=(s, s), padding=[(1, 1)] * 2,
                            count_include_pad=False)
        return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                            epsilon=1e-5, dtype=self.dtype,
                            use_scale=False, use_bias=False, name="bn")(x)


def _zero(x, stride):
    if stride == 1:
        return jnp.zeros_like(x)
    return jnp.zeros_like(x[:, ::stride, ::stride, :])


def make_op(name: str, C: int, stride: int, dtype=jnp.float32,
            module_name: str | None = None):
    mn = module_name or name
    if name == "none":
        return lambda x, train=False: _zero(x, stride)
    if name == "skip_connect":
        if stride == 1:
            return lambda x, train=False: x
        return FactorizedReduce(C, dtype=dtype, name=mn)
    if name == "max_pool_3x3":
        # CDARTS maps pools to bare Pool — NO BatchNorm (ops.py:12-13 use
        # Pool, not the dead PoolBN class); released retrain ckpts have no
        # pool BN params.
        return lambda x, train=False: nn.max_pool(
            x, (3, 3), strides=(stride, stride), padding=[(1, 1)] * 2)
    if name == "avg_pool_3x3":
        return lambda x, train=False: nn.avg_pool(
            x, (3, 3), strides=(stride, stride), padding=[(1, 1)] * 2,
            count_include_pad=False)
    if name == "sep_conv_3x3":
        return SepConv(C, 3, stride, dtype=dtype, name=mn)
    if name == "sep_conv_5x5":
        return SepConv(C, 5, stride, dtype=dtype, name=mn)
    if name == "dil_conv_3x3":
        return DilConv(C, 3, stride, dtype=dtype, name=mn)
    if name == "dil_conv_5x5":
        return DilConv(C, 5, stride, dtype=dtype, name=mn)
    raise ValueError(name)


class MixedOp(nn.Module):
    """Continuous relaxation: weighted sum over all primitives."""
    C: int
    stride: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, weights, train=False):
        out = None
        for i, prim in enumerate(PRIMITIVES):
            if prim == "none":
                y = _zero(x, self.stride)
            elif prim == "skip_connect" and self.stride == 1:
                y = x
            else:
                y = make_op(prim, self.C, self.stride, self.dtype,
                            module_name=f"op_{i}")(x, train)
            term = weights[i] * y
            out = term if out is None else out + term
        return out


class SearchCell(nn.Module):
    """DAG cell with 2 inputs and n_nodes intermediates (search_cells.py)."""
    n_nodes: int
    C: int
    reduction_p: bool
    reduction: bool
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, s0, s1, w_dag, w_edge, train=False):
        if self.reduction_p:
            s0 = FactorizedReduce(self.C, dtype=self.dtype, name="preproc0")(s0, train)
        else:
            s0 = StdConv(self.C, affine=False, dtype=self.dtype, name="preproc0")(s0, train)
        s1 = StdConv(self.C, affine=False, dtype=self.dtype, name="preproc1")(s1, train)

        states = [s0, s1]
        offset = 0
        for i in range(self.n_nodes):
            cur = None
            for j, s in enumerate(states):
                stride = 2 if self.reduction and j < 2 else 1
                y = MixedOp(self.C, stride, dtype=self.dtype,
                            name=f"dag_{i}_{j}")(s, w_dag[offset + j], train)
                y = w_edge[offset + j] * y
                cur = y if cur is None else cur + y
            states.append(cur)
            offset += len(states) - 1
        return jnp.concatenate(states[2:], axis=-1)


class SearchCNN(nn.Module):
    """Stem + stacked search cells with reductions at 1/3 and 2/3 depth."""
    num_classes: int = 10
    C: int = 16
    n_layers: int = 8
    n_nodes: int = 4
    stem_multiplier: int = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, alphas_normal, alphas_reduce, train=False):
        """alphas_*: (n_edges, n_primitives) logits; edge weights use the
        CDARTS scheme of softmax over ops + sigmoid-free edge norm — here the
        standard DARTS softmax over ops, uniform edges."""
        w_normal = jax.nn.softmax(alphas_normal, -1)
        w_reduce = jax.nn.softmax(alphas_reduce, -1)
        n_edges = alphas_normal.shape[0]
        ones = jnp.ones((n_edges,), self.dtype)

        C_cur = self.C * self.stem_multiplier
        x = ConvBN(C_cur, 3, 1, 1, dtype=self.dtype, name="stem")(x, train)
        s0 = s1 = x
        C_pp, C_p, C_cur = C_cur, C_cur, self.C
        red_p = False
        for li in range(self.n_layers):
            reduction = li in (self.n_layers // 3, 2 * self.n_layers // 3)
            if reduction:
                C_cur *= 2
            w = w_reduce if reduction else w_normal
            s0, s1 = s1, SearchCell(self.n_nodes, C_cur, red_p, reduction,
                                    dtype=self.dtype, name=f"cell_{li}")(
                                        s0, s1, w, ones, train)
            red_p = reduction
            C_pp, C_p = C_p, C_cur * self.n_nodes
        x = s1.mean(axis=(1, 2))
        return nn.Dense(self.num_classes, dtype=self.dtype, name="head")(x)


def n_alpha_edges(n_nodes: int = 4) -> int:
    return sum(2 + i for i in range(n_nodes))


def init_alphas(rng: jax.Array, n_nodes: int = 4) -> dict:
    e = n_alpha_edges(n_nodes)
    k1, k2 = jax.random.split(rng)
    return {"normal": 1e-3 * jax.random.normal(k1, (e, len(PRIMITIVES))),
            "reduce": 1e-3 * jax.random.normal(k2, (e, len(PRIMITIVES)))}


def parse_genotype(alphas: dict, n_nodes: int | None = None) -> Genotype:
    """Discretize: per node keep the top-2 incoming edges by best non-'none'
    op weight (genotypes.py parse). n_nodes inferred from the edge count
    (e = n(n+3)/2) when not given."""
    import numpy as np

    if n_nodes is None:
        e = alphas["normal"].shape[0]
        n_nodes = int((-3 + (9 + 8 * e) ** 0.5) / 2)
        assert n_alpha_edges(n_nodes) == e, (e, n_nodes)

    def parse_one(a):
        w = np.asarray(jax.nn.softmax(jnp.asarray(a), -1))
        gene = []
        offset = 0
        none_idx = PRIMITIVES.index("none")
        for i in range(n_nodes):
            rows = w[offset:offset + 2 + i].copy()
            rows[:, none_idx] = -1
            best_op = rows.argmax(-1)
            best_w = rows.max(-1)
            top2 = np.argsort(-best_w)[:2]
            gene.append([(PRIMITIVES[best_op[j]], int(j)) for j in sorted(top2)])
            offset += 2 + i
        return gene

    concat = list(range(2, 2 + n_nodes))
    return Genotype(parse_one(alphas["normal"]), concat,
                    parse_one(alphas["reduce"]), concat)


class AugmentCell(nn.Module):
    """Discrete cell from a genotype gene (genotypes.py to_dag)."""
    gene: tuple
    concat: tuple
    C: int
    reduction_p: bool
    reduction: bool
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, s0, s1, train=False):
        if self.reduction_p:
            s0 = FactorizedReduce(self.C, dtype=self.dtype, name="preproc0")(s0, train)
        else:
            s0 = StdConv(self.C, dtype=self.dtype, name="preproc0")(s0, train)
        s1 = StdConv(self.C, dtype=self.dtype, name="preproc1")(s1, train)
        states = [s0, s1]
        for i, edges in enumerate(self.gene):
            cur = None
            for e, (op_name, s_idx) in enumerate(edges):
                stride = 2 if self.reduction and s_idx < 2 else 1
                y = make_op(op_name, self.C, stride, self.dtype,
                            module_name=f"dag_{i}_{e}")(states[s_idx], train) \
                    if op_name != "skip_connect" or stride != 1 else states[s_idx]
                cur = y if cur is None else cur + y
            states.append(cur)
        return jnp.concatenate([states[i] for i in self.concat], axis=-1)


class AugmentCNN(nn.Module):
    """Retrain network from a genotype (model_augment.py)."""
    genotype: Any
    num_classes: int = 10
    C: int = 36
    n_layers: int = 20
    stem_multiplier: int = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        g = self.genotype
        C_cur = self.C * self.stem_multiplier
        x = ConvBN(C_cur, 3, 1, 1, dtype=self.dtype, name="stem")(x, train)
        s0 = s1 = x
        C_cur = self.C
        red_p = False
        for li in range(self.n_layers):
            reduction = li in (self.n_layers // 3, 2 * self.n_layers // 3)
            if reduction:
                C_cur *= 2
            gene = tuple(tuple(e) for e in (g.reduce if reduction else g.normal))
            concat = tuple(g.reduce_concat if reduction else g.normal_concat)
            s0, s1 = s1, AugmentCell(gene, concat, C_cur, red_p, reduction,
                                     dtype=self.dtype, name=f"cell_{li}")(
                                         s0, s1, train)
            red_p = reduction
        x = s1.mean(axis=(1, 2))
        return nn.Dense(self.num_classes, dtype=self.dtype, name="head")(x)


def genotype_from_str(s: str) -> Genotype:
    """Parse a genotype repr string (CDARTS/lib/utils/genotypes.py:36-53
    from_str; the cell_file JSONs store these). Evaluated in a namespace
    exposing only Genotype and range."""
    g = eval(s, {"__builtins__": {}, "Genotype": Genotype, "range": range})
    return Genotype(normal=[list(map(tuple, e)) for e in g.normal],
                    normal_concat=list(g.normal_concat),
                    reduce=[list(map(tuple, e)) for e in g.reduce],
                    reduce_concat=list(g.reduce_concat))


def cdarts_retrain_plan(model_type: str, res_stem: bool,
                        n_layers: int | None = None):
    """(layers_reduction, augment_layers, initial reduction_p) exactly as
    ModelTest.__init__ sets them (lib/models/model_test.py:20-40)."""
    if model_type == "cifar":
        return [True, True, False], [7, 7, 6], False
    if model_type == "imagenet":
        if res_stem:
            return [False, True, True, True], [3, 4, 3, 4], False
        return [True, True, False], [5, 5, 4], True
    raise ValueError(model_type)


class CDARTSRetrain(nn.Module):
    """CDARTS retrain/eval network — the reference's ModelTest
    (CDARTS/lib/models/model_test.py): a cifar/imagenet/resnet stem followed
    by layer groups of AugmentCells built from per-layer genotypes, with the
    group's reduction cell at the end (start for res_stem), global average
    pool and a linear classifier. Loads the released retrain checkpoints
    (CDARTS/CDARTS/test.py:72-86 + cells/*.json genotypes)."""
    genotypes: tuple                 # one Genotype per layer group
    model_type: str = "imagenet"
    res_stem: bool = False
    init_channels: int = 48
    stem_multiplier: int = 3
    num_classes: int = 1000
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, *, pyramid: bool = False):
        reductions, cell_nums, reduction_p = cdarts_retrain_plan(
            self.model_type, self.res_stem)
        C0 = self.init_channels * self.stem_multiplier
        if self.model_type == "cifar":
            s0 = s1 = ConvBN(C0, 3, 1, 1, dtype=self.dtype,
                             name="stem")(x, train)
        elif self.res_stem:
            h = ConvBN(C0, 7, 2, 3, dtype=self.dtype, name="stem")(x, train)
            h = nn.relu(h)
            h = jnp.pad(h, ((0, 0), (1, 1), (1, 1), (0, 0)),
                        constant_values=-jnp.inf)
            s0 = s1 = nn.max_pool(h, (3, 3), strides=(2, 2))
        else:
            h = ConvBN(C0 // 2, 3, 2, 1, dtype=self.dtype,
                       name="stem0_a")(x, train)
            h = nn.relu(h)
            s0 = ConvBN(C0, 3, 2, 1, dtype=self.dtype, name="stem0_b")(h, train)
            h = nn.relu(s0)
            s1 = ConvBN(C0, 3, 2, 1, dtype=self.dtype, name="stem1")(h, train)

        c_cur = self.init_channels
        feats = [s1]                 # stem output (stride 8 imagenet stem)
        for li, genotype in enumerate(self.genotypes):
            reduction_cur = reductions[li]
            cell_num = cell_nums[li]
            reduction_idx = 0 if self.res_stem else cell_num - 1
            C = c_cur
            for i in range(cell_num):
                reduction = (i == reduction_idx) and reduction_cur
                if reduction:
                    C *= 2
                gene = genotype.reduce if reduction else genotype.normal
                concat = (genotype.reduce_concat if reduction
                          else genotype.normal_concat)
                cell = AugmentCell(tuple(tuple(e) for e in gene),
                                   tuple(concat), C, reduction_p, reduction,
                                   dtype=self.dtype, name=f"cell_{li}_{i}")
                s0, s1 = s1, cell(s0, s1, train)
                reduction_p = reduction
            if reduction_cur:
                c_cur *= 2
            if self.res_stem:
                reduction_p = False
            feats.append(s1)

        if pyramid:
            # last feature at each of the three largest distinct strides
            # (imagenet stem: stem /8, group0 /16, groups1-2 /32)
            by_stride: dict[int, jnp.ndarray] = {}
            for f in feats:
                by_stride[f.shape[1]] = f
            sizes = sorted(by_stride, reverse=True)[:3]
            return tuple(by_stride[s] for s in sizes)

        x = s1.mean(axis=(1, 2))
        return nn.Dense(self.num_classes, dtype=self.dtype, name="fc")(x)

    def forward_pyramid(self, x, train: bool = False) -> tuple:
        """Three coarsest-stride features for detection necks (the
        CDARTS_detection downstream contract — NAS backbones feeding mmdet
        FPN+RetinaNet, CDARTS/CDARTS_detection/mmdet/models/backbones/)."""
        return self(x, train, pyramid=True)


@register_model
def cdarts_retrain_imagenet(genotypes, num_classes: int = 1000,
                            init_channels: int = 48, res_stem: bool = False,
                            dtype=jnp.float32, **kw):
    """genotypes: per-layer Genotype list, or the cell_file dict/strings."""
    if isinstance(genotypes, dict):
        genotypes = [genotypes[k] for k in sorted(genotypes, key=int)]
    genotypes = tuple(genotype_from_str(g) if isinstance(g, str) else g
                      for g in genotypes)
    return CDARTSRetrain(genotypes=genotypes, model_type="imagenet",
                         res_stem=res_stem, init_channels=init_channels,
                         num_classes=num_classes, dtype=dtype, **kw)


@register_model
def cdarts_retrain_cifar(genotypes, num_classes: int = 10,
                         init_channels: int = 36, dtype=jnp.float32, **kw):
    if isinstance(genotypes, dict):
        genotypes = [genotypes[k] for k in sorted(genotypes, key=int)]
    genotypes = tuple(genotype_from_str(g) if isinstance(g, str) else g
                      for g in genotypes)
    return CDARTSRetrain(genotypes=genotypes, model_type="cifar",
                         init_channels=init_channels,
                         num_classes=num_classes, dtype=dtype, **kw)


@register_model
def darts_search_cifar(num_classes: int = 10, dtype=jnp.float32, **kw):
    return SearchCNN(num_classes=num_classes, dtype=dtype, **kw)


@register_model
def darts_augment_cifar(genotype, num_classes: int = 10, dtype=jnp.float32, **kw):
    return AugmentCNN(genotype=genotype, num_classes=num_classes, dtype=dtype, **kw)
