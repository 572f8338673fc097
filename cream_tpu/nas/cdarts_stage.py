"""CDARTS multi-stage controller: layer-by-layer discretization with
super <-> nas parameter copy and distill/aux heads.

Rebuild of CDARTS/lib/models/cdarts_controller.py (structure, aux heads
:150-163, forward :640-710, param copy :314-380, genotype :598-640) and the
staged driver CDARTS/CDARTS/search.py:126-300 + lib/core/search_function.py.

TPU-first differences from the torch original:
  * The controller is ONE flax module holding both the searchable (SearchCell)
    layers and the discretized (AugmentCell) layers; `super_flag`/`layer_idx`
    pick the forward path. Instead of torch's deepcopy + module surgery per
    cycle, discretization = constructing the module with new static genotypes
    and re-initializing — parameters carry over functionally via
    `copy_super_to_nas` / `copy_nas_to_super` pytree maps (pure dict
    transforms of params AND batch_stats, the equivalent of
    copy_params_from_super_layer / copy_params_from_nas_layer).
  * Alphas/betas live in the driver's own pytree (repeat_cell=True semantics:
    one shared arch per cell type), optimized by a separate optax transform.
  * The joint val-batch step (alpha + nas-weight update with the interactive
    loss between super and nas ensemble logits) and the train-batch super
    weight step are each a single jitted function.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax

from cream_tpu.models.darts import (AugmentCell, Genotype, PRIMITIVES,
                                    SearchCell, n_alpha_edges)
from cream_tpu.nn.layers import ConvBN
from cream_tpu.train.losses import interactive_loss

Dtype = Any


class DistillHead(nn.Module):
    """Aux classifier head (CDARTS/lib/models/aux_head.py:5-27):
    ReLU -> AvgPool(size, stride 2) -> 1x1 Conv128+BN+ReLU ->
    2x2 Conv768+BN+ReLU -> GAP -> Linear."""
    pool_size: int
    num_classes: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        s = self.pool_size
        x = nn.relu(x)
        x = nn.avg_pool(x, (s, s), strides=(2, 2), count_include_pad=False)
        x = nn.Conv(128, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv1")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, use_scale=False,
                         use_bias=False, name="bn1")(x)
        x = nn.relu(x)
        x = nn.Conv(768, (2, 2), use_bias=False, dtype=self.dtype,
                    name="conv2")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, use_scale=False,
                         use_bias=False, name="bn2")(x)
        x = nn.relu(x)
        x = x.mean(axis=(1, 2))
        return nn.Dense(self.num_classes, dtype=self.dtype,
                        name="classifier")(x)


def _layer_channels(C: int, stem_multiplier: int, layer_num: int,
                    cells_per_layer: int, n_nodes: int):
    """Channel/reduction schedule: each non-final layer ends with a reduction
    cell (cdarts_controller.py add_super_layer, res_stem=False branch)."""
    plan = []      # per layer: list of (C_cur, reduction_p, reduction)
    C_pp = C_p = C * stem_multiplier
    C_cur = C
    red_p = False
    for li in range(layer_num):
        cells = []
        for ci in range(cells_per_layer):
            reduction = (ci == cells_per_layer - 1) and li < layer_num - 1
            if reduction:
                C_cur *= 2
            cells.append((C_cur, red_p, reduction, C_pp, C_p))
            red_p = reduction
            C_pp, C_p = C_p, C_cur * n_nodes
        plan.append(cells)
    return plan


class CDARTSController(nn.Module):
    """Super + nas paths over a shared stem, with distill aux heads.

    genotypes: per-layer static Genotype for the nas path (the current
    discretization); the super path is always present and weighted by the
    alphas passed to __call__.
    """
    genotypes: tuple                      # layer_num Genotype entries
    num_classes: int = 10
    layer_num: int = 3
    cells_per_layer: int = 2
    n_nodes: int = 4
    C: int = 16
    stem_multiplier: int = 3
    aux_pool_size: int = 6
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, alphas: dict, layer_idx: int = 0,
                 super_flag: bool = True, pretrain: bool = False,
                 train: bool = False, init_all: bool = False):
        """Returns (logits, ensemble_logits) — or (logits, aux_logits) when
        pretrain (cdarts_controller.py:640-710). init_all additionally runs
        the other path so ONE init creates every parameter (module instances
        below are created once and shared between the two passes)."""
        plan = _layer_channels(self.C, self.stem_multiplier, self.layer_num,
                               self.cells_per_layer, self.n_nodes)
        w_dag = {k: jax.nn.softmax(alphas[k], -1)
                 for k in ("normal", "reduce")}
        # per-node edge softmax over the beta logits (process_alpha)
        w_edge = {}
        for k in ("normal", "reduce"):
            beta = alphas["beta_" + k]
            parts = []
            off = 0
            for i in range(self.n_nodes):
                n_in = 2 + i
                parts.append(jax.nn.softmax(beta[off:off + n_in]))
                off += n_in
            w_edge[k] = jnp.concatenate(parts)

        # shared module instances (params created on first call only)
        stem = ConvBN(self.C * self.stem_multiplier, 3, 1, 1,
                      dtype=self.dtype, name="stem")
        aux_heads = {
            self.layer_num - 3: DistillHead(self.aux_pool_size,
                                            self.num_classes,
                                            dtype=self.dtype,
                                            name="distill_aux_head1"),
            self.layer_num - 2: DistillHead(self.aux_pool_size,
                                            self.num_classes,
                                            dtype=self.dtype,
                                            name="distill_aux_head2"),
        }
        fc_super = nn.Dense(self.num_classes, dtype=self.dtype,
                            name="fc_super")
        fc_nas = nn.Dense(self.num_classes, dtype=self.dtype, name="fc_nas")
        super_cells, nas_cells = {}, {}
        for li in range(self.layer_num):
            g = self.genotypes[li]
            for ci, (C_cur, red_p, red, _, _) in enumerate(plan[li]):
                super_cells[li, ci] = SearchCell(
                    self.n_nodes, C_cur, red_p, red, dtype=self.dtype,
                    name=f"super_{li}_{ci}")
                gene = tuple(tuple(e) for e in (g.reduce if red else g.normal))
                concat = tuple(g.reduce_concat if red else g.normal_concat)
                nas_cells[li, ci] = AugmentCell(
                    gene, concat, C_cur, red_p, red, dtype=self.dtype,
                    name=f"nas_{li}_{ci}")

        def run_path(sflag: bool):
            s0 = s1 = stem(x, train)
            outputs = []
            aux_logits = None
            for li in range(self.layer_num):
                use_nas = (not pretrain) and (
                    li < layer_idx if sflag else True)
                for ci in range(len(plan[li])):
                    if use_nas:
                        s0, s1 = s1, nas_cells[li, ci](s0, s1, train)
                    else:
                        k = "reduce" if plan[li][ci][2] else "normal"
                        s0, s1 = s1, super_cells[li, ci](
                            s0, s1, w_dag[k], w_edge[k], train)
                if li in aux_heads:
                    a = aux_heads[li](s1, train)
                    if not pretrain:
                        outputs.append(a)
                    aux_logits = a
            out = s1.mean(axis=(1, 2))
            logits = (fc_super if (sflag or pretrain) else fc_nas)(out)
            return logits, outputs, aux_logits

        logits, outputs, aux_logits = run_path(super_flag)
        if init_all:
            run_path(not super_flag)
        if pretrain:
            return logits, aux_logits

        outputs.append(logits)
        ens = self.param("ensemble_param",
                         nn.initializers.constant(1.0 / 3), (3,), jnp.float32)
        w = jax.nn.softmax(ens[:len(outputs)])
        em = sum(w[i] * outputs[i] for i in range(len(outputs)))
        return logits, em


# ---------------------------------------------------------------- alphas ---

def init_stage_alphas(rng: jax.Array, n_nodes: int = 4) -> dict:
    e = n_alpha_edges(n_nodes)
    k1, k2 = jax.random.split(rng)
    return {"normal": 1e-3 * jax.random.normal(k1, (e, len(PRIMITIVES))),
            "reduce": 1e-3 * jax.random.normal(k2, (e, len(PRIMITIVES))),
            "beta_normal": jnp.zeros((e,)),
            "beta_reduce": jnp.zeros((e,))}


def parse_stage_genotype(alphas: dict, n_nodes: int = 4) -> Genotype:
    """process_alpha semantics (cdarts_controller.py:711-745): rank edges by
    max over ops of edge_softmax(beta) * op_softmax(alpha), 'none' excluded."""
    def parse_one(a, b):
        aw = np.asarray(jax.nn.softmax(jnp.asarray(a), -1))
        gene = []
        off = 0
        none_idx = PRIMITIVES.index("none")
        for i in range(n_nodes):
            n_in = 2 + i
            ew = np.asarray(jax.nn.softmax(jnp.asarray(b[off:off + n_in])))
            rows = aw[off:off + n_in].copy()
            rows[:, none_idx] = -1.0
            scored = ew[:, None] * rows
            best_op = scored.argmax(-1)
            best_w = scored.max(-1)
            top2 = np.argsort(-best_w)[:2]
            gene.append([(PRIMITIVES[best_op[j]], int(j))
                         for j in sorted(top2)])
            off += n_in
        return gene

    concat = list(range(2, 2 + n_nodes))
    return Genotype(parse_one(alphas["normal"], alphas["beta_normal"]), concat,
                    parse_one(alphas["reduce"], alphas["beta_reduce"]), concat)


# ----------------------------------------------------------- param copies ---

def _cell_copy(tree: dict, src_cell: dict, dst_name: str, gene, reduction):
    """Build the AugmentCell param subtree for one cell from a SearchCell
    subtree (copy_params_from_super_layer, cdarts_controller.py:314-345)."""
    dst = dict(tree.get(dst_name, {}))
    for pre in ("preproc0", "preproc1"):
        if pre in src_cell:
            dst[pre] = src_cell[pre]
    for node, edges in enumerate(gene):
        for e, (op_name, s_idx) in enumerate(edges):
            stride = 2 if reduction and s_idx < 2 else 1
            if op_name == "none" or (op_name == "skip_connect" and stride == 1):
                continue
            mixed = src_cell.get(f"dag_{node}_{s_idx}", {})
            op = mixed.get(f"op_{PRIMITIVES.index(op_name)}")
            if op is not None:
                dst[f"dag_{node}_{e}"] = op
    return dst


def _copy_layer(col: dict, li: int, cells_plan, genotype,
                direction: str) -> dict:
    col = dict(col)
    for ci, (_, _, red, _, _) in enumerate(cells_plan):
        gene = genotype.reduce if red else genotype.normal
        sup_name, nas_name = f"super_{li}_{ci}", f"nas_{li}_{ci}"
        if direction == "super_to_nas":
            if sup_name in col:
                col[nas_name] = _cell_copy(col, col[sup_name], nas_name,
                                           gene, red)
        else:
            # inverse: write the nas op params back into the super MixedOps
            if nas_name not in col or sup_name not in col:
                continue
            sup = {k: (dict(v) if isinstance(v, dict) else v)
                   for k, v in col[sup_name].items()}
            nas = col[nas_name]
            for pre in ("preproc0", "preproc1"):
                if pre in nas:
                    sup[pre] = nas[pre]
            for node, edges in enumerate(gene):
                for e, (op_name, s_idx) in enumerate(edges):
                    stride = 2 if red and s_idx < 2 else 1
                    if op_name == "none" or (op_name == "skip_connect"
                                             and stride == 1):
                        continue
                    if f"dag_{node}_{e}" in nas:
                        mixed = dict(sup.get(f"dag_{node}_{s_idx}", {}))
                        mixed[f"op_{PRIMITIVES.index(op_name)}"] = \
                            nas[f"dag_{node}_{e}"]
                        sup[f"dag_{node}_{s_idx}"] = mixed
            col[sup_name] = sup
    return col


def copy_super_to_nas(variables: dict, model: CDARTSController,
                      layers: Sequence[int]) -> dict:
    """Functional copy_params_from_super_layer for params + batch_stats."""
    plan = _layer_channels(model.C, model.stem_multiplier, model.layer_num,
                           model.cells_per_layer, model.n_nodes)
    out = {}
    for coll, tree in variables.items():
        t = dict(tree)
        if coll in ("params", "batch_stats"):
            for li in layers:
                t = _copy_layer(t, li, plan[li], model.genotypes[li],
                                "super_to_nas")
        out[coll] = t
    return out


def copy_nas_to_super(variables: dict, model: CDARTSController,
                      layers: Sequence[int]) -> dict:
    """Functional copy_params_from_nas_layer (the reverse sync)."""
    plan = _layer_channels(model.C, model.stem_multiplier, model.layer_num,
                           model.cells_per_layer, model.n_nodes)
    out = {}
    for coll, tree in variables.items():
        t = dict(tree)
        if coll in ("params", "batch_stats"):
            for li in layers:
                t = _copy_layer(t, li, plan[li], model.genotypes[li],
                                "nas_to_super")
        out[coll] = t
    return out


def transfer_variables(new_vars: dict, old_vars: dict) -> dict:
    """Carry every leaf whose path + shape still exists into a freshly
    initialized variable tree (used when discretization rebuilds the module
    with new static genotypes)."""
    def merge(new, old):
        if not isinstance(new, dict) or not isinstance(old, dict):
            same = (hasattr(new, "shape") and hasattr(old, "shape")
                    and new.shape == old.shape and new.dtype == old.dtype)
            return old if same else new
        return {k: (merge(v, old[k]) if k in old else v)
                for k, v in new.items()}
    return merge(new_vars, old_vars)


# ------------------------------------------------------------------ steps ---

def make_pretrain_step(model: CDARTSController, tx, aux_weight: float = 0.4):
    """Supernet-pool warmup: CE on fc_super + weighted aux CE
    (search_function.py retrain_warmup)."""
    def step(params, batch_stats, opt_state, alphas, batch):
        def loss_fn(p):
            (logits, aux), mut = model.apply(
                {"params": p, "batch_stats": batch_stats}, batch["image"],
                alphas, pretrain=True, train=True, mutable=["batch_stats"])
            loss = optax.softmax_cross_entropy_with_integer_labels(
                logits, batch["label"]).mean()
            if aux is not None:
                loss = loss + aux_weight * \
                    optax.softmax_cross_entropy_with_integer_labels(
                        aux, batch["label"]).mean()
            return loss, mut["batch_stats"]
        (loss, stats), g = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(g, opt_state, params)
        return optax.apply_updates(params, updates), stats, opt_state, loss
    return jax.jit(step, static_argnames=())


def make_joint_search_step(model: CDARTSController, nas_tx, alpha_tx,
                           loss_alpha: float = 1.0, loss_T: float = 2.0,
                           interactive_type: str = "kl",
                           reg_weight: float = 0.0):
    """The val-batch update (search_function.py:30-75): CE on both paths,
    interactive loss between ensemble logits, L1 alpha regularization;
    gradients flow to the nas-path weights AND the alphas."""
    reg_idx = [PRIMITIVES.index(p) for p in
               ("max_pool_3x3", "avg_pool_3x3", "skip_connect")]

    def step(params, batch_stats, nas_opt, alphas, alpha_opt, batch,
             layer_idx: int):
        def loss_fn(p, a):
            variables = {"params": p, "batch_stats": batch_stats}
            (lg_s, em_s), mut = model.apply(
                variables, batch["image"], a, layer_idx=layer_idx,
                super_flag=True, train=True, mutable=["batch_stats"])
            (lg_n, em_n), mut2 = model.apply(
                {"params": p, "batch_stats": mut["batch_stats"]},
                batch["image"], a, layer_idx=layer_idx, super_flag=False,
                train=True, mutable=["batch_stats"])
            ce = optax.softmax_cross_entropy_with_integer_labels
            loss_cls = (ce(lg_s, batch["label"]).mean() +
                        ce(lg_n, batch["label"]).mean()) / loss_alpha
            loss_int = interactive_loss(em_s, em_n, kind=interactive_type,
                                        tau=loss_T) * loss_alpha
            reg = 0.0
            if reg_weight:
                for k in ("normal", "reduce"):
                    w = jax.nn.softmax(a[k], -1)
                    reg = reg + sum(w[:, i].sum() for i in reg_idx)
            loss = loss_cls + loss_int + reg_weight * reg
            return loss, (mut2["batch_stats"], lg_n)

        (loss, (stats, lg_n)), (gp, ga) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True)(params, alphas)
        pu, nas_opt = nas_tx.update(gp, nas_opt, params)
        params = optax.apply_updates(params, pu)
        au, alpha_opt = alpha_tx.update(ga, alpha_opt, alphas)
        alphas = optax.apply_updates(alphas, au)
        acc = (lg_n.argmax(-1) == batch["label"]).mean()
        return params, stats, nas_opt, alphas, alpha_opt, loss, acc
    return jax.jit(step, static_argnames=("layer_idx",))


def make_super_weight_step(model: CDARTSController, tx):
    """The train-batch super-path weight step (search_function.py:115-130)."""
    def step(params, batch_stats, opt_state, alphas, batch, layer_idx: int):
        def loss_fn(p):
            (logits, _), mut = model.apply(
                {"params": p, "batch_stats": batch_stats}, batch["image"],
                alphas, layer_idx=layer_idx, super_flag=True, train=True,
                mutable=["batch_stats"])
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, batch["label"]).mean(), mut["batch_stats"]
        (loss, stats), g = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(g, opt_state, params)
        return optax.apply_updates(params, updates), stats, opt_state, loss
    return jax.jit(step, static_argnames=("layer_idx",))


@dataclasses.dataclass
class StageSearchConfig:
    layer_num: int = 3
    cells_per_layer: int = 2
    n_nodes: int = 4
    C: int = 16
    num_classes: int = 10
    pretrain_epochs: int = 1
    search_iters: int = 2
    steps_per_iter: int = 8
    w_lr: float = 0.05
    nas_lr: float = 0.05
    alpha_lr: float = 3e-4
    loss_alpha: float = 1.0
    loss_T: float = 2.0
    interactive_type: str = "kl"
    reg_weight: float = 1e-3
    aux_pool_size: int = 6
    clean_arch: bool = True


class MultiStageSearcher:
    """The staged CDARTS campaign (CDARTS/CDARTS/search.py:126-300):

    for layer_idx in 0..layer_num:
        optionally re-init alphas (clean_arch)
        warm the super pool (pretrain epochs)
        per search iter: discretize current alphas -> rebuild nas layers,
            copy super->nas params, then alternate joint val steps
            (alphas + nas weights + interactive loss) with super weight steps
        freeze layer layer_idx at its best genotype (layer-by-layer
        discretization) and sync its params
    """

    def __init__(self, cfg: StageSearchConfig, rng: jax.Array,
                 sample_batch: dict, dtype=jnp.float32):
        self.cfg = cfg
        self.dtype = dtype
        self.rng, k = jax.random.split(rng)
        self.alphas = init_stage_alphas(k, cfg.n_nodes)
        self.genotypes = [parse_stage_genotype(self.alphas, cfg.n_nodes)
                          ] * cfg.layer_num
        self.model = self._build()
        self.rng, k = jax.random.split(self.rng)
        self.variables = jax.jit(
            lambda r, x: self.model.init(r, x, self.alphas, init_all=True))(
                k, sample_batch["image"])
        self.w_tx = optax.sgd(cfg.w_lr, momentum=0.9)
        self.nas_tx = optax.sgd(cfg.nas_lr, momentum=0.9)
        self.alpha_tx = optax.adam(cfg.alpha_lr, b1=0.5, b2=0.999)
        self._rebuild_steps()
        self.history: list = []

    def _build(self) -> CDARTSController:
        c = self.cfg
        return CDARTSController(
            genotypes=tuple(self.genotypes), num_classes=c.num_classes,
            layer_num=c.layer_num, cells_per_layer=c.cells_per_layer,
            n_nodes=c.n_nodes, C=c.C, aux_pool_size=c.aux_pool_size,
            dtype=self.dtype)

    def _rebuild_steps(self):
        c = self.cfg
        self.opt_state = self.w_tx.init(self.variables["params"])
        self.nas_opt = self.nas_tx.init(self.variables["params"])
        self.alpha_opt = self.alpha_tx.init(self.alphas)
        self._pre = make_pretrain_step(self.model, self.w_tx)
        self._joint = make_joint_search_step(
            self.model, self.nas_tx, self.alpha_tx, c.loss_alpha, c.loss_T,
            c.interactive_type, c.reg_weight)
        self._wstep = make_super_weight_step(self.model, self.w_tx)

    def _discretize(self, layers: Sequence[int], sample_batch: dict):
        """Rebuild nas layers for `layers` from the current alphas, carry all
        surviving params, and copy super->nas (build_nas_layers +
        copy_params_from_super_layer)."""
        g = parse_stage_genotype(self.alphas, self.cfg.n_nodes)
        for li in layers:
            self.genotypes[li] = g
        self.model = self._build()
        self.rng, k = jax.random.split(self.rng)
        fresh = jax.jit(lambda r, x: self.model.init(r, x, self.alphas, init_all=True))(
            k, sample_batch["image"])
        self.variables = transfer_variables(
            jax.device_get(fresh), jax.device_get(self.variables))
        self.variables = copy_super_to_nas(self.variables, self.model,
                                           list(layers))
        self._rebuild_steps()

    def run(self, train_batches, val_batches, log=print):
        """train_batches/val_batches: callables giving fresh iterators."""
        c = self.cfg
        for layer_idx in range(c.layer_num):
            if c.clean_arch and layer_idx > 0:
                self.rng, k = jax.random.split(self.rng)
                self.alphas = init_stage_alphas(k, c.n_nodes)
            sample = next(iter(val_batches()))
            for ep in range(c.pretrain_epochs):
                for i, tb in enumerate(train_batches()):
                    if i >= c.steps_per_iter:
                        break
                    p, s, self.opt_state, loss = self._pre(
                        self.variables["params"],
                        self.variables["batch_stats"], self.opt_state,
                        self.alphas, tb)
                    self.variables = {"params": p, "batch_stats": s}
                log(f"[layer {layer_idx}] pretrain {ep}: loss {float(loss):.3f}")
            for it in range(c.search_iters):
                self._discretize(range(layer_idx, c.layer_num), sample)
                accs = []
                for i, (tb, vb) in enumerate(zip(train_batches(),
                                                 val_batches())):
                    if i >= c.steps_per_iter:
                        break
                    (p, s, self.nas_opt, self.alphas, self.alpha_opt, jl,
                     acc) = self._joint(
                        self.variables["params"],
                        self.variables["batch_stats"], self.nas_opt,
                        self.alphas, self.alpha_opt, vb, layer_idx)
                    self.variables = {"params": p, "batch_stats": s}
                    p, s, self.opt_state, wl = self._wstep(
                        self.variables["params"],
                        self.variables["batch_stats"], self.opt_state,
                        self.alphas, tb, layer_idx)
                    self.variables = {"params": p, "batch_stats": s}
                    accs.append(float(acc))
                    # sync trained nas weights back into the super pool
                self.variables = copy_nas_to_super(
                    self.variables, self.model,
                    list(range(layer_idx, c.layer_num)))
                g = parse_stage_genotype(self.alphas, c.n_nodes)
                self.history.append({"layer": layer_idx, "iter": it,
                                     "val_acc": float(np.mean(accs or [0])),
                                     "genotype": g})
                log(f"[layer {layer_idx}] iter {it}: joint {float(jl):.3f} "
                    f"acc {np.mean(accs or [0]):.3f} genotype {g.normal[0]}")
            # layer-by-layer discretization: freeze this layer's genotype
            self._discretize([layer_idx], sample)
        return self.genotypes, self.history
