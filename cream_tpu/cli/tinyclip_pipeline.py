"""TinyCLIP multi-stage compression pipeline as ONE driveable command.

Orchestrates the reference's staged recipe (TinyCLIP/src/training/main.py:
326-371 + script/auto_weight_inherit_100to75.sh → 75to50.sh): per stage,

  1. affinity-distill the current model against the previous stage (teacher)
     while the L0 hard-concrete gates learn masks toward the stage's target
     sparsity (lagrangian with multiplier ascent, sparsity warmup);
  2. FUSE MASK: materialize the pruned towers with prune_clip (gate values
     folded into weights, channels physically removed) — the "convert pruned
     model to base" step;
  3. the pruned model becomes the next stage's student and teacher-to-beat.

`--manual-inherit` instead shrinks widths/depths by the target ratio and
front-slices weights with weight_inherit (the manual-inheritance variant,
TinyCLIP/src/open_clip/weight_inherit.py).

Smoke recipe (synthetic image-text pairs, ~3 min on CPU; shrinks a toy tower
100% -> 75% -> 50%):

    python -m cream_tpu.cli.tinyclip_pipeline --cpu --synthetic \
        --sparsities 0.25 0.333 --steps 30 --batch-size 8 \
        --l0-lr 0.5 --l0-init-mean 2.0 --out /tmp/tinyclip_stages

(--l0-init-mean 10.0 is the reference init; at smoke step counts the gates
cannot travel from +10, so the smoke starts them near the keep/drop boundary.)
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import optax

from cream_tpu.distill.clip_losses import (clip_contrastive_loss,
                                           clip_soft_loss)
from cream_tpu.distill.l0 import (L0Config, init_l0_params, lagrangian_loss,
                                  lambda_sign_mask, sample_masks)
from cream_tpu.distill.weight_inherit import weight_inherit
from cream_tpu.models.clip import CLIP, CLIPConfig, prune_clip


def tower_l0_cfg(width: int, layers: int, heads: int,
                 types=("hidden", "heads", "intermediate"),
                 heads_per_layer=None, mlp_per_layer=None) -> L0Config:
    """Default gate types match the auto-inheritance recipe (hidden/heads/
    intermediate); add 'layer' for whole-branch mha/ffn gates — prune_clip
    materializes fully-dropped branches as heads/mlp_width == 0 blocks.
    heads_per_layer/mlp_per_layer describe an already-pruned (ragged) tower
    so later stages can keep compressing it."""
    return L0Config(hidden_size=width, intermediate_size=width * 4,
                    num_attention_heads=max(1, heads),
                    num_hidden_layers=layers, pruning_types=tuple(types),
                    heads_per_layer=heads_per_layer,
                    intermediate_per_layer=mlp_per_layer)


def synthetic_pairs(batch, image_size, ctx, n, seed=0):
    rng = np.random.default_rng(seed)
    return [(jnp.asarray(rng.standard_normal((batch, image_size, image_size,
                                               3)), jnp.float32),
             jnp.asarray(rng.integers(1, 1000, (batch, ctx))))
            for _ in range(n)]


def n_params(tree) -> int:
    return sum(int(np.prod(l.shape))
               for l in jax.tree_util.tree_leaves(tree))


def run_stage(model, variables, cfg, target_sparsity, batches, args,
              stage_idx):
    """Distill-with-pruning then fuse: returns (model, variables, cfg)."""
    teacher_vars = jax.tree_util.tree_map(jnp.asarray, variables)
    tup = lambda x: tuple(x) if x is not None else None
    cfgs = {"v": tower_l0_cfg(cfg.vision_width, cfg.vision_layers,
                              cfg.vision_width // 64,
                              heads_per_layer=tup(model.vision_heads),
                              mlp_per_layer=tup(model.vision_mlp_widths))}
    l0 = {"v": init_l0_params(cfgs["v"], init_mean=args.l0_init_mean)}
    if args.prune_text:
        cfgs["t"] = tower_l0_cfg(cfg.text_width, cfg.text_layers,
                                 cfg.text_heads,
                                 heads_per_layer=tup(model.text_heads_per_layer),
                                 mlp_per_layer=tup(model.text_mlp_widths))
        l0["t"] = init_l0_params(cfgs["t"], init_mean=args.l0_init_mean)

    trainable = {"model": variables["params"], "l0": l0}
    # the l0 gates/multipliers get their own (much faster) optimizer, like the
    # reference's dedicated l0_module param group (training/main.py optimizer)
    tx = optax.multi_transform(
        {"model": optax.adam(args.lr), "l0": optax.adam(args.l0_lr)},
        {"model": "model", "l0": "l0"})
    opt = tx.init(trainable)
    sign = {k: lambda_sign_mask(v) for k, v in l0.items()}

    def loss_fn(tr, img, txt, rng, step):
        masks_v = sample_masks(rng, tr["l0"]["v"], cfgs["v"])
        masks_t = sample_masks(rng, tr["l0"]["t"], cfgs["t"]) \
            if "t" in tr["l0"] else None
        vars_s = {"params": tr["model"]}
        img_f, txt_f, scale = model.apply(vars_s, img, txt,
                                          image_masks=masks_v,
                                          text_masks=masks_t)
        t_img, t_txt, t_scale = model.apply(
            {"params": teacher_vars["params"]}, img, txt)
        loss = clip_soft_loss(img_f, txt_f, scale,
                              jax.lax.stop_gradient(t_img),
                              jax.lax.stop_gradient(t_txt), t_scale)
        if args.contrastive_weight:
            loss = loss + args.contrastive_weight * clip_contrastive_loss(
                img_f, txt_f, scale)
        lag_v, sv, _ = lagrangian_loss(tr["l0"]["v"], cfgs["v"],
                                       target_sparsity, step,
                                       args.sparsity_warmup)
        loss = loss + lag_v
        if "t" in tr["l0"]:
            lag_t, _, _ = lagrangian_loss(tr["l0"]["t"], cfgs["t"],
                                          target_sparsity, step,
                                          args.sparsity_warmup)
            loss = loss + lag_t
        return loss.mean(), sv

    @jax.jit
    def step_fn(tr, opt, img, txt, rng, step):
        (loss, sv), g = jax.value_and_grad(loss_fn, has_aux=True)(
            tr, img, txt, rng, step)
        # lagrangian multipliers ASCEND: flip their gradient sign
        g = {"model": g["model"],
             "l0": jax.tree_util.tree_map(lambda s, x: s * x, sign, g["l0"])}
        upd, opt = tx.update(g, opt, tr)
        return optax.apply_updates(tr, upd), opt, loss, sv

    rng = jax.random.key(args.seed + stage_idx)

    # mid-stage checkpoint/resume (the reference resumes INSIDE an epoch via
    # saved iter_in_epoch, TinyCLIP/src/training/main.py:400 + in-epoch
    # periodic saves train.py:155-156): (trainable, opt, rng, step) round-
    # trips through one npz; a killed run restarts on the next unseen step
    # and reproduces the unbroken run bit-for-bit.
    ckpt = (os.path.join(args.out, f"mid_stage_{stage_idx}.npz")
            if getattr(args, "save_every", 0) else None)
    start = 0
    flat0, treedef = jax.tree_util.tree_flatten((trainable, opt))
    if ckpt and os.path.exists(ckpt):
        data = np.load(ckpt, allow_pickle=False)
        leaves = [jnp.asarray(data[f"leaf_{j}"]) for j in range(len(flat0))]
        trainable, opt = jax.tree_util.tree_unflatten(treedef, leaves)
        rng = jax.random.wrap_key_data(jnp.asarray(data["rng"]))
        start = int(data["step"])
        print(f"  stage {stage_idx}: resumed mid-stage at step {start}",
              flush=True)

    def save_mid(step):
        flat, _ = jax.tree_util.tree_flatten((trainable, opt))
        np.savez(ckpt, step=step,
                 rng=np.asarray(jax.random.key_data(rng)),
                 **{f"leaf_{j}": np.asarray(l) for j, l in enumerate(flat)})

    loss = sv = jnp.nan
    for i in range(start, args.steps):
        img, txt = batches[i % len(batches)]
        rng, sub = jax.random.split(rng)
        trainable, opt, loss, sv = step_fn(trainable, opt, img, txt, sub,
                                           jnp.asarray(i))
        if ckpt and (i + 1) % args.save_every == 0:
            save_mid(i + 1)
        if getattr(args, "stop_after", 0) and (i + 1) >= args.stop_after:
            print(f"  stage {stage_idx}: --stop-after {args.stop_after} "
                  "(simulated kill)", flush=True)
            return None
    if ckpt and os.path.exists(ckpt):
        os.remove(ckpt)
    print(f"  stage {stage_idx}: final loss {float(loss):.3f} "
          f"vision sparsity {float(sv):.3f}", flush=True)

    # FUSE MASK: deterministic masks -> physically pruned model
    masks_v = sample_masks(rng, trainable["l0"]["v"], cfgs["v"],
                           training=False)
    masks_t = sample_masks(rng, trainable["l0"]["t"], cfgs["t"],
                           training=False) if "t" in trainable["l0"] else None
    before = n_params(trainable["model"])
    new_model, new_vars = prune_clip({"params": trainable["model"]}, cfg,
                                     masks_v, masks_t)
    after = n_params(new_vars["params"])
    print(f"  => fuse MASK: {before} -> {after} params "
          f"({after / before:.2%})", flush=True)
    return new_model, new_vars, new_model.cfg


def run_stage_manual(model, variables, cfg, target_sparsity, args):
    """Manual inheritance: shrink widths by (1 - sparsity) and front-slice
    teacher weights (weight_inherit)."""
    keep = 1.0 - target_sparsity
    def r64(x):
        return max(64, int(round(x * keep / 64)) * 64)
    new_cfg = dataclasses.replace(
        cfg, vision_width=r64(cfg.vision_width),
        text_width=r64(cfg.text_width),
        vision_layers=max(1, int(round(cfg.vision_layers * keep))),
        text_layers=max(1, int(round(cfg.text_layers * keep))))
    student = CLIP(cfg=new_cfg)
    img = jnp.zeros((1, cfg.image_size, cfg.image_size, 3))
    txt = jnp.zeros((1, cfg.context_length), jnp.int32)
    sv = jax.jit(lambda r: student.init(r, img, txt))(jax.random.key(0))
    inherited = weight_inherit(jax.device_get(sv["params"]),
                               jax.device_get(variables["params"]))
    return student, {"params": inherited}, new_cfg


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--synthetic", action="store_true")
    ap.add_argument("--sparsities", type=float, nargs="+",
                    default=[0.25, 0.333])
    ap.add_argument("--steps", type=int, default=6)
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--image-size", type=int, default=64)
    ap.add_argument("--vision-width", type=int, default=128)
    ap.add_argument("--vision-layers", type=int, default=2)
    ap.add_argument("--text-width", type=int, default=128)
    ap.add_argument("--text-layers", type=int, default=2)
    ap.add_argument("--context", type=int, default=16)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--l0-lr", type=float, default=0.1,
                    help="learning rate for the hard-concrete gates and "
                         "lagrangian multipliers")
    ap.add_argument("--l0-init-mean", type=float, default=10.0,
                    help="initial gate log-alpha (reference default 10 = "
                         "strongly keep; lower it for short smoke runs so "
                         "the lagrangian can reach the target in few steps)")
    ap.add_argument("--sparsity-warmup", type=int, default=2)
    ap.add_argument("--contrastive-weight", type=float, default=1.0)
    ap.add_argument("--prune-text", action="store_true", default=True)
    ap.add_argument("--no-prune-text", dest="prune_text",
                    action="store_false")
    ap.add_argument("--manual-inherit", action="store_true")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--save-every", type=int, default=0,
                    help="mid-stage checkpoint every N steps (0 = off); a "
                         "restarted run auto-resumes from the latest")
    ap.add_argument("--stop-after", type=int, default=0,
                    help="exit after N steps of the current stage "
                         "(kill-simulation hook for resume testing)")
    ap.add_argument("--out", default="tinyclip_stages")
    args = ap.parse_args(argv)
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    cfg = CLIPConfig(embed_dim=64, vision_width=args.vision_width,
                     vision_layers=args.vision_layers, vision_patch=16,
                     image_size=args.image_size, text_width=args.text_width,
                     text_layers=args.text_layers,
                     text_heads=max(2, args.text_width // 64),
                     context_length=args.context)
    model = CLIP(cfg=cfg)
    batches = synthetic_pairs(args.batch_size, args.image_size, args.context,
                              max(2, args.steps // 2), args.seed)
    variables = jax.jit(lambda r: model.init(r, *batches[0]))(
        jax.random.key(args.seed))
    variables = {"params": variables["params"]}

    os.makedirs(args.out, exist_ok=True)
    report = [{"stage": "base", "params": n_params(variables["params"]),
               "vision_width": cfg.vision_width}]
    for si, sp in enumerate(args.sparsities):
        print(f"stage {si}: target sparsity {sp}", flush=True)
        if args.manual_inherit:
            model, variables, cfg = run_stage_manual(model, variables, cfg,
                                                     sp, args)
        else:
            out = run_stage(model, variables, cfg, sp, batches, args, si)
            if out is None:          # simulated kill (--stop-after)
                return None
            model, variables, cfg = out
        report.append({"stage": si, "target_sparsity": sp,
                       "params": n_params(variables["params"]),
                       "vision_width": cfg.vision_width,
                       "text_width": cfg.text_width})
        np.savez(os.path.join(args.out, f"stage_{si}.npz"),
                 **{"note": np.asarray(f"pruned stage {si}")})

    # sanity: the final model still encodes and the pair similarity is finite
    img, txt = batches[0]
    img_f, txt_f, _ = jax.jit(lambda v, i, t: model.apply(v, i, t))(
        variables, img, txt)
    sim = float((img_f * txt_f).sum(-1).mean())
    report.append({"final_pair_similarity": sim})
    assert np.isfinite(sim)
    with open(os.path.join(args.out, "report.json"), "w") as fh:
        json.dump(report, fh, indent=2)
    print(f"wrote {args.out}/report.json: "
          f"{[r.get('params') for r in report if 'params' in r]} params")


if __name__ == "__main__":
    main()
