"""DETR-with-iRPE parity vs the reference run live as a torch oracle:
RPE multi-head attention, encoder layer, sine position embedding, box ops,
Hungarian matcher, plus criterion invariants."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from cream_tpu.models.detr import (DETR, MLP, RPEMultiheadAttention,
                                   TransformerEncoderLayer, parse_enc_rpe2d,
                                   sine_position_embedding)
from cream_tpu.models.resnet import ResNetBackbone
from cream_tpu.ops.rpe import get_rpe_config
from cream_tpu.train import detection as D

from torch_ref import load_detr_module, load_detr_rpe_attention

E, H, B = 64, 4, 2
HW = (6, 8)
L = HW[0] * HW[1]


def t2n(t):
    return t.detach().numpy()


def map_mha(prefix, sd):
    """torch RPEMultiheadAttention state_dict -> our flax params."""
    p = {"in_proj_kernel": t2n(sd[f"{prefix}in_proj_weight"]).T,
         "in_proj_bias": t2n(sd[f"{prefix}in_proj_bias"]),
         "out_proj": {"kernel": t2n(sd[f"{prefix}out_proj.weight"]).T,
                      "bias": t2n(sd[f"{prefix}out_proj.bias"])}}
    for r in ("rpe_q", "rpe_k", "rpe_v"):
        key = f"{prefix}{r}.lookup_table_weight"
        if key in sd:
            p[r] = {"lookup_table_weight": t2n(sd[key])}
    return p


class TestRPEMultiheadAttention:
    @pytest.mark.parametrize("rpe_on", ["k", "qkv"])
    def test_parity_with_padding(self, rpe_on):
        pkg = load_detr_rpe_attention()
        torch.manual_seed(0)
        ref_cfg = pkg.irpe.get_rpe_config(ratio=1.9, method="product",
                                          mode="ctx", shared_head=True,
                                          skip=0, rpe_on=rpe_on)
        ref = pkg.RPEMultiheadAttention(E, H, dropout=0.0,
                                        rpe_config=ref_cfg).eval()
        rng = np.random.default_rng(0)
        src = rng.standard_normal((B, L, E)).astype(np.float32)
        pos = rng.standard_normal((B, L, E)).astype(np.float32)
        kpm = np.zeros((B, L), bool)
        kpm[1, -10:] = True                       # image 1 partially padded
        q = src + pos

        tq = torch.tensor(q).transpose(0, 1)      # (L, B, E) seq-first
        tv = torch.tensor(src).transpose(0, 1)
        with torch.no_grad():
            ref_out, _ = ref(tq, tq, tv, key_padding_mask=torch.tensor(kpm),
                             hw=HW)
        ref_out = t2n(ref_out.transpose(0, 1))

        ours = RPEMultiheadAttention(
            E, H, get_rpe_config(ratio=1.9, method="product", mode="ctx",
                                 shared_head=True, skip=0, rpe_on=rpe_on))
        params = map_mha("", ref.state_dict())
        got = ours.apply({"params": params}, jnp.asarray(q), jnp.asarray(q),
                         jnp.asarray(src), key_padding_mask=jnp.asarray(kpm),
                         hw=HW)
        np.testing.assert_allclose(np.asarray(got), ref_out, atol=2e-5,
                                   rtol=1e-4)


class TestEncoderLayer:
    def test_parity(self):
        tmod = load_detr_module("models.transformer")
        pkg = load_detr_rpe_attention()
        torch.manual_seed(1)
        ref_cfg = pkg.irpe.get_rpe_config(ratio=1.9, method="product",
                                          mode="ctx", shared_head=True,
                                          skip=0, rpe_on="k")
        ref = tmod.TransformerEncoderLayer(E, H, dim_feedforward=128,
                                           dropout=0.0,
                                           rpe_config=ref_cfg).eval()
        sd = ref.state_dict()
        rng = np.random.default_rng(1)
        src = rng.standard_normal((B, L, E)).astype(np.float32)
        pos = rng.standard_normal((B, L, E)).astype(np.float32)
        kpm = np.zeros((B, L), bool)
        kpm[0, -5:] = True
        with torch.no_grad():
            ref_out = ref(torch.tensor(src).transpose(0, 1),
                          src_key_padding_mask=torch.tensor(kpm),
                          pos=torch.tensor(pos).transpose(0, 1), hw=HW)
        ref_out = t2n(ref_out.transpose(0, 1))

        def ln(p):
            return {"scale": t2n(sd[f"{p}.weight"]),
                    "bias": t2n(sd[f"{p}.bias"])}

        def lin(p):
            return {"kernel": t2n(sd[f"{p}.weight"]).T,
                    "bias": t2n(sd[f"{p}.bias"])}

        params = {"self_attn": map_mha("self_attn.", sd),
                  "norm1": ln("norm1"), "norm2": ln("norm2"),
                  "ffn": {"linear1": lin("linear1"),
                          "linear2": lin("linear2")}}
        ours = TransformerEncoderLayer(
            E, H, 128, rpe_config=get_rpe_config(
                ratio=1.9, method="product", mode="ctx", shared_head=True,
                skip=0, rpe_on="k"))
        got = ours.apply({"params": params}, jnp.asarray(src),
                         jnp.asarray(kpm), jnp.asarray(pos), hw=HW)
        np.testing.assert_allclose(np.asarray(got), ref_out, atol=5e-5,
                                   rtol=1e-4)


class TestPositionEmbedding:
    def test_sine_parity(self):
        pmod = load_detr_module("models.position_encoding")
        from util.misc import NestedTensor
        ref = pmod.PositionEmbeddingSine(E // 2, normalize=True)
        rng = np.random.default_rng(2)
        imgs = rng.standard_normal((B, E, *HW)).astype(np.float32)
        mask = np.zeros((B, *HW), bool)
        mask[1, :, -3:] = True
        with torch.no_grad():
            ref_pos = ref(NestedTensor(torch.tensor(imgs),
                                       torch.tensor(mask)))
        ref_pos = t2n(ref_pos).transpose(0, 2, 3, 1)          # NCHW -> NHWC
        got = sine_position_embedding(jnp.asarray(mask), E // 2)
        np.testing.assert_allclose(np.asarray(got), ref_pos, atol=1e-5)


class TestBoxOpsAndMatcher:
    def _boxes(self, rng, n):
        cx, cy = rng.uniform(0.2, 0.8, (2, n))
        w, h = rng.uniform(0.05, 0.3, (2, n))
        return np.stack([cx, cy, w, h], -1).astype(np.float32)

    def test_giou_parity(self):
        bo = load_detr_module("util.box_ops")
        rng = np.random.default_rng(3)
        a, b = self._boxes(rng, 7), self._boxes(rng, 5)
        ref = t2n(bo.generalized_box_iou(
            bo.box_cxcywh_to_xyxy(torch.tensor(a)),
            bo.box_cxcywh_to_xyxy(torch.tensor(b))))
        got = D.generalized_box_iou(D.box_cxcywh_to_xyxy(jnp.asarray(a)),
                                    D.box_cxcywh_to_xyxy(jnp.asarray(b)))
        np.testing.assert_allclose(np.asarray(got), ref, atol=1e-5)

    def test_matcher_parity(self):
        mmod = load_detr_module("models.matcher")
        ref_matcher = mmod.HungarianMatcher(cost_class=1, cost_bbox=5,
                                            cost_giou=2)
        rng = np.random.default_rng(4)
        Q, C, M = 10, 6, 4
        logits = rng.standard_normal((B, Q, C + 1)).astype(np.float32)
        pboxes = self._boxes(rng, B * Q).reshape(B, Q, 4)
        sizes = [3, 2]
        tgt_boxes = np.zeros((B, M, 4), np.float32)
        tgt_labels = np.zeros((B, M), np.int64)
        valid = np.zeros((B, M), bool)
        targets = []
        for i, n in enumerate(sizes):
            bx = self._boxes(rng, n)
            lb = rng.integers(0, C, n)
            tgt_boxes[i, :n], tgt_labels[i, :n], valid[i, :n] = bx, lb, True
            targets.append({"boxes": torch.tensor(bx),
                            "labels": torch.tensor(lb)})
        with torch.no_grad():
            ref_idx = ref_matcher(
                {"pred_logits": torch.tensor(logits),
                 "pred_boxes": torch.tensor(pboxes)}, targets)

        cost = D.matching_cost(jnp.asarray(logits), jnp.asarray(pboxes),
                               jnp.asarray(tgt_boxes),
                               jnp.asarray(tgt_labels),
                               jnp.asarray(valid))
        assign = D.hungarian_assign(np.asarray(cost), valid)
        for i, (src, tgt) in enumerate(ref_idx):
            # ref gives (query_idx, target_idx) sorted pairs; ours stores
            # query per target slot
            for q_i, t_i in zip(t2n(src), t2n(tgt)):
                assert assign[i, t_i] == q_i

    def test_criterion_invariants(self):
        """Perfect one-hot predictions at the matched slots -> ~zero loss."""
        rng = np.random.default_rng(5)
        Q, C, M = 8, 5, 3
        tgt_boxes = self._boxes(rng, B * M).reshape(B, M, 4)
        tgt_labels = rng.integers(0, C, (B, M))
        valid = np.ones((B, M), bool)
        logits = np.full((B, Q, C + 1), -20.0, np.float32)
        logits[..., C] = 20.0                      # default: no-object
        pboxes = np.tile(np.asarray([0.5, 0.5, 0.1, 0.1], np.float32),
                         (B, Q, 1))
        for i in range(B):
            for j in range(M):
                logits[i, j, :] = -20.0
                logits[i, j, tgt_labels[i, j]] = 20.0
                pboxes[i, j] = tgt_boxes[i, j]
        out = {"pred_logits": jnp.asarray(logits),
               "pred_boxes": jnp.asarray(pboxes)}
        losses = D.criterion(out, jnp.asarray(tgt_boxes),
                             jnp.asarray(tgt_labels), jnp.asarray(valid),
                             num_classes=C)
        assert float(losses["loss_ce"]) < 1e-3
        assert float(losses["loss_bbox"]) < 1e-6
        assert float(losses["loss_giou"]) < 1e-5
        assert float(losses["cardinality_error"]) == 0.0


class TestDETRModel:
    def test_forward_and_grad(self):
        model = DETR(backbone=ResNetBackbone((1, 1, 1, 1), "basic"),
                     num_classes=6, num_queries=8, hidden_dim=32, nhead=4,
                     num_encoder_layers=1, num_decoder_layers=2,
                     dim_feedforward=64, aux_loss=True,
                     rpe_config=parse_enc_rpe2d("rpe-1.9-product-ctx-1-k"))
        img = jnp.zeros((2, 64, 64, 3))
        mask = jnp.zeros((2, 64, 64), bool).at[1, :, 32:].set(True)
        v = jax.jit(lambda r: model.init(r, img, mask))(jax.random.key(0))
        out = jax.jit(lambda v: model.apply(v, img, mask))(v)
        assert out["pred_logits"].shape == (2, 8, 7)
        assert out["pred_boxes"].shape == (2, 8, 4)
        assert len(out["aux_outputs"]) == 1
        assert np.isfinite(np.asarray(out["pred_logits"])).all()

        rng = np.random.default_rng(6)
        tgt_boxes = jnp.asarray(np.clip(rng.random((2, 3, 4)), 0.1, 0.4))
        tgt_labels = jnp.asarray(rng.integers(0, 6, (2, 3)))
        valid = jnp.asarray([[1, 1, 0], [1, 0, 0]], bool)

        cost = D.matching_cost(out["pred_logits"], out["pred_boxes"],
                               tgt_boxes, tgt_labels, valid)
        assign = jnp.asarray(D.hungarian_assign(np.asarray(cost),
                                                np.asarray(valid)))

        def loss_fn(params):
            o = model.apply({"params": params,
                             "constants": v["constants"]}, img, mask)
            l = D.detection_loss(o, tgt_boxes, tgt_labels, valid, assign, 6)
            return l["loss_ce"] + 5 * l["loss_bbox"] + 2 * l["loss_giou"]

        g = jax.jit(jax.grad(loss_fn))(v["params"])
        gnorm = sum(float(jnp.abs(x).sum())
                    for x in jax.tree_util.tree_leaves(g))
        assert np.isfinite(gnorm) and gnorm > 0
