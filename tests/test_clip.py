"""TinyCLIP stack: two-tower model, gates, L0, losses (incl. sharded gather),
weight inheritance, prune materialization, tokenizer, zero-shot, logits store."""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from cream_tpu.models import create_model
from cream_tpu.models.clip import CLIPConfig, prune_clip
from cream_tpu.distill import (
    L0Config, LogitsReader, LogitsWriter, clip_contrastive_loss,
    clip_soft_loss, expected_sparsity, init_l0_params, lagrangian_loss,
    lambda_sign_mask, sample_masks, weight_inherit)

from helpers import jit_init, n_params


def tiny_clip(**kw):
    cfg = CLIPConfig(embed_dim=64, vision_width=128, vision_layers=2,
                     vision_patch=16, image_size=64, text_width=128,
                     text_layers=2, text_heads=2, context_length=16,
                     vocab_size=1000)
    from cream_tpu.models.clip import CLIP
    return CLIP(cfg=cfg, **kw), cfg


class TestCLIPModel:
    def test_two_tower_forward(self):
        model, _ = tiny_clip()
        img = jax.random.normal(jax.random.key(0), (4, 64, 64, 3))
        txt = jax.random.randint(jax.random.key(1), (4, 16), 1, 999)
        v = jit_init(model, img, txt)
        i, t, s = jax.jit(lambda v, a, b: model.apply(v, a, b))(v, img, txt)
        assert i.shape == (4, 64) and t.shape == (4, 64)
        np.testing.assert_allclose(np.linalg.norm(i, axis=-1), 1.0, atol=1e-5)
        assert float(s) == pytest.approx(1 / 0.07, rel=1e-4)

    def test_param_count_39m(self):
        model = create_model("tinyclip_vit_39m_16_text_19m")
        img = jnp.zeros((1, 224, 224, 3))
        txt = jnp.zeros((1, 77), jnp.int32)
        v = jax.eval_shape(lambda: model.init(jax.random.key(0), img, txt))
        vis = n_params(v["params"]["visual"]) / 1e6
        # "Text-19M" counts transformer params excluding the token embedding
        txt_n = (n_params(v["params"]["text"])
                 - v["params"]["text"]["token_embedding"]["embedding"].size) / 1e6
        assert abs(vis - 39) / 39 < 0.08, vis     # ViT-39M/16
        assert abs(txt_n - 19) / 19 < 0.08, txt_n  # Text-19M

    def test_gates_affect_output(self):
        model, cfg = tiny_clip()
        img = jax.random.normal(jax.random.key(0), (2, 64, 64, 3))
        txt = jax.random.randint(jax.random.key(1), (2, 16), 1, 999)
        v = jit_init(model, img, txt)
        masks = {"hidden_z": jnp.ones(128).at[64:].set(0.0),
                 "heads_z": jnp.ones((2, 2)), "mha_z": jnp.ones(2),
                 "intermediate_z": jnp.ones((2, 512)), "ffn_z": jnp.ones(2)}
        base = model.apply(v, img, txt)
        gated = model.apply(v, img, txt, image_masks=masks)
        assert not np.allclose(np.asarray(base[0]), np.asarray(gated[0]))


class TestPrune:
    def test_prune_matches_masked_forward(self):
        model, cfg = tiny_clip()
        img = jax.random.normal(jax.random.key(0), (2, 64, 64, 3))
        txt = jax.random.randint(jax.random.key(1), (2, 16), 1, 999)
        v = jit_init(model, img, txt)
        # hard 0/1 masks: drop half the hidden, one head in layer 0, and some
        # intermediate dims
        vm = {"hidden_z": jnp.ones(128).at[100:].set(0.0),
              "heads_z": jnp.ones((2, 2)).at[0, 1].set(0.0),
              "mha_z": jnp.ones(2),
              "intermediate_z": jnp.ones((2, 512)).at[:, 400:].set(0.0),
              "ffn_z": jnp.ones(2)}
        tm = {"hidden_z": jnp.ones(128).at[96:].set(0.0),
              "heads_z": jnp.ones((2, 2)), "mha_z": jnp.ones(2),
              "intermediate_z": jnp.ones((2, 512)).at[:, 256:].set(0.0),
              "ffn_z": jnp.ones(2)}
        masked_i = model.apply(v, img, txt, image_masks=vm, text_masks=tm)
        pruned, pv = prune_clip(v, cfg, vm, tm)
        out = pruned.apply(pv, img, txt)
        np.testing.assert_allclose(np.asarray(masked_i[0]), np.asarray(out[0]),
                                   atol=2e-4, rtol=1e-3)
        np.testing.assert_allclose(np.asarray(masked_i[1]), np.asarray(out[1]),
                                   atol=2e-4, rtol=1e-3)
        # actually smaller
        assert n_params(pv["params"]) < n_params(v["params"])

    def test_whole_branch_drop_matches_masked_forward(self):
        """mha_z/ffn_z == 0 branches materialize as heads/mlp_width == 0
        blocks that own no params (block-skipping materialization)."""
        model, cfg = tiny_clip()
        img = jax.random.normal(jax.random.key(0), (2, 64, 64, 3))
        txt = jax.random.randint(jax.random.key(1), (2, 16), 1, 999)
        v = jit_init(model, img, txt)
        vm = {"hidden_z": jnp.ones(128),
              "heads_z": jnp.ones((2, 2)),
              "mha_z": jnp.ones(2).at[0].set(0.0),     # drop layer-0 attn
              "intermediate_z": jnp.ones((2, 512)),
              "ffn_z": jnp.ones(2).at[1].set(0.0)}     # drop layer-1 ffn
        masked = model.apply(v, img, txt, image_masks=vm)
        pruned, pv = prune_clip(v, cfg, vm, None)
        out = pruned.apply(pv, img, txt)
        np.testing.assert_allclose(np.asarray(masked[0]), np.asarray(out[0]),
                                   atol=2e-4, rtol=1e-3)
        assert pruned.vision_heads == [0, 2]
        assert pruned.vision_mlp_widths[1] == 0
        blk0 = pv["params"]["visual"]["transformer"]["resblocks_0"]
        blk1 = pv["params"]["visual"]["transformer"]["resblocks_1"]
        assert "attn" not in blk0 and "ln_1" not in blk0
        assert "c_fc" not in blk1 and "ln_2" not in blk1

    def test_reprune_pruned_model(self):
        """A pruned (ragged) model is a first-class citizen: build a ragged
        L0Config from its per-layer dims and prune it AGAIN."""
        model, cfg = tiny_clip()
        img = jax.random.normal(jax.random.key(0), (2, 64, 64, 3))
        txt = jax.random.randint(jax.random.key(1), (2, 16), 1, 999)
        v = jit_init(model, img, txt)
        vm = {"hidden_z": jnp.ones(128).at[100:].set(0.0),
              "heads_z": jnp.ones((2, 2)).at[0, 1].set(0.0),
              "mha_z": None,
              "intermediate_z": jnp.ones((2, 512)).at[:, 300:].set(0.0),
              "ffn_z": None}
        m1, v1 = prune_clip(v, cfg, vm, None)
        rag = L0Config(hidden_size=m1.cfg.vision_width,
                       intermediate_size=m1.cfg.vision_width * 4,
                       num_attention_heads=2, num_hidden_layers=2,
                       pruning_types=("heads", "intermediate"),
                       heads_per_layer=tuple(m1.vision_heads),
                       intermediate_per_layer=tuple(m1.vision_mlp_widths))
        p = init_l0_params(rag, init_mean=-10.0)   # drop almost everything
        masks = sample_masks(jax.random.key(2), p, rag, training=False)
        m2, v2 = prune_clip(v1, m1.cfg, masks, None)
        out = m2.apply(v2, img, txt)
        assert np.isfinite(np.asarray(out[0])).all()
        assert n_params(v2["params"]) < n_params(v1["params"]) \
            < n_params(v["params"])


class TestL0:
    def test_sparsity_monotone_in_loga(self):
        cfg = L0Config(hidden_size=128, intermediate_size=512,
                       num_attention_heads=2, num_hidden_layers=2)
        p_keep = init_l0_params(cfg, init_mean=10.0)
        p_drop = init_l0_params(cfg, init_mean=-10.0)
        assert float(expected_sparsity(p_keep, cfg)) < 0.01
        assert float(expected_sparsity(p_drop, cfg)) > 0.95

    def test_lagrangian_zero_when_satisfied(self):
        cfg = L0Config(hidden_size=128, intermediate_size=512,
                       num_attention_heads=2, num_hidden_layers=2)
        p = init_l0_params(cfg, init_mean=-10.0)   # ~fully sparse
        loss, s, t = lagrangian_loss(p, cfg, target_sparsity=0.5)
        assert float(loss) == 0.0 and float(s) > 0.5

    def test_sample_and_deterministic_masks(self):
        cfg = L0Config(hidden_size=16, intermediate_size=32,
                       num_attention_heads=2, num_hidden_layers=2)
        p = init_l0_params(cfg, init_mean=2.0)
        m = sample_masks(jax.random.key(0), p, cfg, training=True)
        assert m["hidden_z"].shape == (16,)
        assert float(m["hidden_z"].min()) >= 0 and float(m["hidden_z"].max()) <= 1
        md = sample_masks(jax.random.key(0), p, cfg, training=False)
        assert md["heads_z"].shape == (2, 2)

    def test_ragged_l0(self):
        """Per-layer (ragged) gate sizes: tuple loga params, tuple masks,
        finite monotone sparsity; zero-size rows (dropped branches) legal."""
        cfg = L0Config(hidden_size=100, intermediate_size=400,
                       num_attention_heads=2, num_hidden_layers=2,
                       pruning_types=("heads", "intermediate"),
                       heads_per_layer=(0, 2),
                       intermediate_per_layer=(100, 300))
        p = init_l0_params(cfg, init_mean=2.0)
        assert isinstance(p["heads_loga"], tuple)
        assert p["heads_loga"][0].shape == (0,)
        assert p["intermediate_loga"][1].shape == (300,)
        m = sample_masks(jax.random.key(0), p, cfg, training=True)
        assert m["heads_z"][1].shape == (2,)
        md = sample_masks(jax.random.key(0), p, cfg, training=False)
        assert md["intermediate_z"][0].shape == (100,)
        s_keep = expected_sparsity(init_l0_params(cfg, 10.0), cfg)
        s_drop = expected_sparsity(init_l0_params(cfg, -10.0), cfg)
        assert float(s_keep) < 0.01 and float(s_drop) > 0.95
        # sign mask mirrors the ragged structure
        sg = lambda_sign_mask(p)
        assert isinstance(sg["heads_loga"], tuple)
        assert sg["lambda_1"] == -1.0

    def test_lambda_sign_mask(self):
        cfg = L0Config(hidden_size=16, intermediate_size=32,
                       num_attention_heads=2, num_hidden_layers=2)
        p = init_l0_params(cfg)
        signs = lambda_sign_mask(p)
        assert signs["lambda_1"] == -1.0 and signs["hidden_loga"] == 1.0


class TestCLIPLosses:
    def test_contrastive_perfect_alignment_low_loss(self):
        d = 32
        feats = jax.random.normal(jax.random.key(0), (8, d))
        feats = feats / jnp.linalg.norm(feats, axis=-1, keepdims=True)
        loss_aligned = clip_contrastive_loss(feats, feats, jnp.float32(100.0))
        other = jax.random.normal(jax.random.key(1), (8, d))
        other = other / jnp.linalg.norm(other, axis=-1, keepdims=True)
        loss_rand = clip_contrastive_loss(feats, other, jnp.float32(100.0))
        assert float(loss_aligned) < 0.01 < float(loss_rand)

    def test_soft_loss_zero_for_matching_teacher(self):
        img = jax.random.normal(jax.random.key(0), (8, 16))
        txt = jax.random.normal(jax.random.key(1), (8, 16))
        img = img / jnp.linalg.norm(img, axis=-1, keepdims=True)
        txt = txt / jnp.linalg.norm(txt, axis=-1, keepdims=True)
        s = jnp.float32(50.0)
        # identical student/teacher -> soft CE equals teacher entropy; compare
        # against cross-teacher instead: loss(student=teacher) <= loss(other)
        l_same = clip_soft_loss(img, txt, s, img, txt, s)
        other = jax.random.normal(jax.random.key(2), (8, 16))
        other = other / jnp.linalg.norm(other, axis=-1, keepdims=True)
        l_diff = clip_soft_loss(other, txt, s, img, txt, s)
        assert float(l_same) < float(l_diff)

    def test_sharded_matches_single_device(self):
        """all_gather path inside shard_map == single-device global loss."""
        devices = jax.devices()[:4]
        mesh = Mesh(np.array(devices), ("data",))
        d, B = 16, 8
        img = jax.random.normal(jax.random.key(0), (B, d))
        txt = jax.random.normal(jax.random.key(1), (B, d))
        img = img / jnp.linalg.norm(img, axis=-1, keepdims=True)
        txt = txt / jnp.linalg.norm(txt, axis=-1, keepdims=True)
        scale = jnp.float32(30.0)

        ref = clip_contrastive_loss(img, txt, scale)

        @jax.jit
        def sharded(img, txt):
            f = shard_map(
                lambda a, b: clip_contrastive_loss(a, b, scale, axis_name="data"),
                mesh=mesh, in_specs=(P("data"), P("data")), out_specs=P())
            return f(img, txt)

        np.testing.assert_allclose(float(sharded(img, txt)), float(ref),
                                   rtol=1e-5)


class TestWeightInherit:
    def test_depth_and_width_inherit(self):
        big, _ = tiny_clip()
        small_cfg = CLIPConfig(embed_dim=64, vision_width=64, vision_layers=1,
                               vision_patch=16, image_size=64, text_width=64,
                               text_layers=1, text_heads=1, context_length=16,
                               vocab_size=1000)
        from cream_tpu.models.clip import CLIP
        small = CLIP(cfg=small_cfg)
        img = jnp.zeros((1, 64, 64, 3))
        txt = jnp.zeros((1, 16), jnp.int32)
        vb = jit_init(big, img, txt)
        vs = jit_init(small, img, txt)
        inherited = weight_inherit(vs["params"], vb["params"], head_dim=64)
        # widths front-sliced
        np.testing.assert_array_equal(
            inherited["visual"]["proj"],
            np.asarray(vb["params"]["visual"]["proj"])[:64])
        # qkv head-aware: student layer 0 head 0 of q == teacher head 0 cols
        t_k = np.asarray(vb["params"]["visual"]["transformer"]["resblocks_0"]
                         ["attn"]["in_proj"]["kernel"])
        s_k = inherited["visual"]["transformer"]["resblocks_0"]["attn"]["in_proj"]["kernel"]
        t_q0 = t_k.reshape(128, 3, 2, 64)[:64, 0, 0]
        s_q0 = s_k.reshape(64, 3, 1, 64)[:, 0, 0]
        np.testing.assert_array_equal(s_q0, t_q0)
        # inherited params run
        out = small.apply({"params": inherited}, img, txt)
        assert np.isfinite(np.asarray(out[0])).all()


class TestLogitsStore:
    def test_roundtrip(self, tmp_path):
        K, C, N = 5, 100, 32
        w = LogitsWriter(str(tmp_path), epoch=0, num_samples=N, topk=K,
                         num_classes=C)
        rng = np.random.default_rng(0)
        vals = rng.random((N, K)).astype(np.float32) * 0.2
        idxs = rng.integers(0, C, (N, K)).astype(np.int32)
        seeds = rng.integers(0, 2**31, (N,)).astype(np.int32)
        # write in shuffled order to prove random access
        order = rng.permutation(N)
        for i in range(0, N, 8):
            sel = order[i:i + 8]
            w.write_batch(sel, seeds[sel], vals[sel], idxs[sel])
        w.close()

        r = LogitsReader(str(tmp_path), epoch=0)
        got_v, got_i, got_s = r.read_batch(np.arange(N))
        np.testing.assert_allclose(got_v, vals, atol=1e-3)  # fp16 roundtrip
        np.testing.assert_array_equal(got_i, idxs)
        np.testing.assert_array_equal(got_s, seeds)


BPE_PATH = "/root/reference/TinyCLIP/src/open_clip/bpe_simple_vocab_16e6.txt.gz"


@pytest.mark.skipif(not os.path.exists(BPE_PATH), reason="no BPE vocab file")
class TestTokenizer:
    def test_tokenize_shapes_and_reference_parity(self):
        from cream_tpu.data.tokenizer import get_tokenizer
        tok = get_tokenizer(BPE_PATH)
        assert tok.vocab_size == 49408
        out = tok(["a photo of a cat", "hello world!"], context_length=77)
        assert out.shape == (2, 77)
        assert out[0, 0] == tok.sot
        # reference oracle comparison (ftfy stubbed: plain captions need no
        # mojibake fixing, so fix_text == identity for these inputs)
        import sys
        import types
        if "ftfy" not in sys.modules:
            ftfy = types.ModuleType("ftfy")
            ftfy.fix_text = lambda s: s
            sys.modules["ftfy"] = ftfy
        import importlib.util
        spec = importlib.util.spec_from_file_location(
            "ref_tok", "/root/reference/TinyCLIP/src/open_clip/tokenizer.py")
        ref = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(ref)
        rt = ref.SimpleTokenizer(BPE_PATH)
        for text in ["a photo of a cat", "The Quick, brown fox; jumps!",
                     "modern art — 1970s"]:
            assert tok.encode(text) == rt.encode(text), text

    def test_roundtrip(self):
        from cream_tpu.data.tokenizer import get_tokenizer
        tok = get_tokenizer(BPE_PATH)
        s = "a painting of two dogs"
        assert tok.decode(tok.encode(s)).strip() == s


class TestZeroShot:
    def test_zero_shot_pipeline_shapes(self):
        from cream_tpu.train.zero_shot import (
            build_zero_shot_classifier, zero_shot_eval)
        D, C = 16, 7

        def fake_tok(texts, context_length=77):
            return np.zeros((len(texts), 8), np.int32)

        def fake_encode_text(tokens):
            k = jax.random.fold_in(jax.random.key(0), tokens.shape[0])
            e = jax.random.normal(k, (tokens.shape[0], D))
            return e / jnp.linalg.norm(e, axis=-1, keepdims=True)

        clf = build_zero_shot_classifier(fake_encode_text, fake_tok,
                                         [f"class{i}" for i in range(C)])
        assert clf.shape == (D, C)

        def fake_encode_image(img):
            e = jax.random.normal(jax.random.key(1), (img.shape[0], D))
            return e / jnp.linalg.norm(e, axis=-1, keepdims=True)

        res = zero_shot_eval(fake_encode_image, clf, [
            {"image": jnp.zeros((4, 8, 8, 3)), "label": np.array([0, 1, 2, 3])}])
        assert 0 <= res["zeroshot_top1"] <= 100 and res["n"] == 4


class TestCLIPClassifierTeacher:
    def test_parity_vs_reference_teacher(self):
        """CLIPClassifier + convert_clip_classifier vs the reference TinyViT
        CLIP teacher (TinyViT/models/clip.py:108-158) — the save_logits
        teacher path."""
        import os
        pytest.importorskip("torch")
        if not os.path.isdir("/root/reference"):
            pytest.skip("reference repo not mounted")
        import torch
        from torch_ref import load_ref_module
        ref = load_ref_module("TinyViT/models/clip.py", "ref_tinyvit_clip")

        torch.manual_seed(0)
        tmodel = ref.CLIP(embed_dim=64, image_resolution=64, vision_layers=2,
                          vision_width=128, vision_patch_size=16,
                          num_classes=12)
        tmodel.eval()
        x = np.random.RandomState(0).randn(2, 64, 64, 3).astype(np.float32)
        with torch.no_grad():
            want = tmodel(torch.from_numpy(x).permute(0, 3, 1, 2)).numpy()

        from cream_tpu.models.clip import CLIPClassifier, CLIPConfig
        from cream_tpu.zoo import convert_clip_classifier
        sd = {k: v.numpy() for k, v in tmodel.state_dict().items()}
        variables = convert_clip_classifier(sd, vision_layers=2)
        jmodel = CLIPClassifier(
            cfg=CLIPConfig(embed_dim=64, vision_width=128, vision_layers=2,
                           vision_patch=16, image_size=64),
            num_classes=12, quick_gelu=True)
        got = jax.jit(lambda v, x: jmodel.apply(v, x))(
            {"params": variables["params"]}, jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(got), want, atol=2e-4, rtol=1e-4)

    def test_registered_factory(self):
        from cream_tpu.models import create_model
        m = create_model("clip_vit_large14_224_classifier", num_classes=21841)
        assert m.cfg.vision_layers == 24 and m.cfg.vision_width == 1024


class TestTensorParallel:
    def test_tp_dp_forward_matches_replicated(self):
        """CLIP towers under a (data=2, model=4) mesh with Megatron-style
        param sharding produce the same features as single-device; XLA
        derives activation shardings and inserts the collectives."""
        from cream_tpu.core.mesh import (CLIP_TP_RULES, create_mesh,
                                         partition_by_rules)
        from jax.sharding import NamedSharding, PartitionSpec as P

        model, cfg = tiny_clip()
        img = jax.random.normal(jax.random.key(0), (8, 64, 64, 3))
        txt = jax.random.randint(jax.random.key(1), (8, 16), 1, 999)
        v = jit_init(model, img, txt)
        ref_i, ref_t, _ = jax.jit(model.apply)(v, img, txt)

        mesh = create_mesh({"data": 2, "model": 4})
        param_sh = partition_by_rules(v["params"], CLIP_TP_RULES, mesh)
        # sanity: the rules actually shard the wide layers
        blk = param_sh["visual"]["transformer"]["resblocks_0"]
        assert blk["attn"]["in_proj"]["kernel"].spec == P(None, "model")
        assert blk["c_proj"]["kernel"].spec == P("model", None)

        f = jax.jit(lambda p, i, t: model.apply({"params": p}, i, t),
                    in_shardings=(param_sh, NamedSharding(mesh, P("data")),
                                  NamedSharding(mesh, P("data"))),
                    out_shardings=NamedSharding(mesh, P()))
        p_sharded = jax.device_put(v["params"], param_sh)
        got_i, got_t, _ = f(p_sharded,
                            jax.device_put(img, NamedSharding(mesh, P("data"))),
                            jax.device_put(txt, NamedSharding(mesh, P("data"))))
        np.testing.assert_allclose(np.asarray(got_i), np.asarray(ref_i),
                                   atol=2e-5, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(got_t), np.asarray(ref_t),
                                   atol=2e-5, rtol=1e-4)

    def test_tp_grad_step_runs(self):
        """One contrastive training step with TP x DP sharded params."""
        import optax
        from cream_tpu.core.mesh import (CLIP_TP_RULES, create_mesh,
                                         partition_by_rules)
        from cream_tpu.distill.clip_losses import clip_contrastive_loss
        from jax.sharding import NamedSharding, PartitionSpec as P

        model, cfg = tiny_clip()
        img = jax.random.normal(jax.random.key(0), (8, 64, 64, 3))
        txt = jax.random.randint(jax.random.key(1), (8, 16), 1, 999)
        v = jit_init(model, img, txt)
        mesh = create_mesh({"data": 2, "model": 4})
        param_sh = partition_by_rules(v["params"], CLIP_TP_RULES, mesh)
        p = jax.device_put(v["params"], param_sh)
        tx = optax.adam(1e-4)
        opt = jax.jit(tx.init)(p)   # mu/nu inherit the params' TP sharding

        @jax.jit
        def step(p, opt, img, txt):
            def loss_fn(p):
                i_f, t_f, scale = model.apply({"params": p}, img, txt)
                return clip_contrastive_loss(i_f, t_f, scale).mean()

            loss, g = jax.value_and_grad(loss_fn)(p)
            upd, opt = tx.update(g, opt, p)
            return optax.apply_updates(p, upd), opt, loss

        p, opt, loss = step(p, opt,
                            jax.device_put(img, NamedSharding(mesh, P("data"))),
                            jax.device_put(txt, NamedSharding(mesh, P("data"))))
        assert np.isfinite(float(loss))
        # params keep their TP sharding through the update
        k = p["visual"]["transformer"]["resblocks_0"]["attn"]["in_proj"]["kernel"]
        assert k.sharding.spec == P(None, "model")
