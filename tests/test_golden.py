"""End-to-end golden-exchange test: the reference-side runner
(tools/golden_torch_side.py) and our side (cream_tpu/cli/golden.py) produce
comparable logits for the SAME checkpoint file — the full released-weight
parity protocol exercised with a random-init checkpoint (the only weights
available offline). Verifies: battery bit-identity across the two scripts,
checkpoint load on both sides, and the --compare gate."""
import os
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    not os.path.isdir("/root/reference"), reason="reference repo not mounted")

torch = pytest.importorskip("torch")

TOOLS = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "tools")
sys.path.insert(0, TOOLS)


def test_battery_bit_identical():
    import golden_torch_side
    from cream_tpu.cli.golden import battery
    a = battery(8, 224)
    b = golden_torch_side.battery(8, 224)
    assert a.dtype == b.dtype and (a == b).all()


def test_golden_exchange_roundtrip(tmp_path):
    import golden_torch_side
    from cream_tpu.cli import golden

    # make a "released checkpoint": random-init reference model state_dict,
    # wrapped the way TinyViT releases are ({'model': sd})
    torch.manual_seed(0)
    model = golden_torch_side.build_model("tiny_vit_5m_224",
                                          "/root/reference", None)
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.uniform_(-0.2, 0.2)
                m.running_var.uniform_(0.7, 1.5)
    ckpt = tmp_path / "tiny_vit_5m.pth"
    torch.save({"model": model.state_dict()}, ckpt)

    theirs = tmp_path / "theirs.npz"
    golden_torch_side.main(["--model", "tiny_vit_5m_224", "--ckpt", str(ckpt),
                            "--out", str(theirs), "--n", "8"])

    ours = tmp_path / "ours.npz"
    golden.main(["--model", "tiny_vit_5m_224", "--torch-ckpt", str(ckpt),
                 "--dump", str(ours), "--n", "8"])

    r = golden.compare(str(ours), str(theirs))
    assert r["top1_agree"] == 1.0
    assert r["maxdiff"] < 2e-3, r  # fp32 CPU both sides

    # the gate must actually fire on disagreement
    bad = tmp_path / "bad.npz"
    d = dict(np.load(theirs, allow_pickle=True))
    d["logits"] = np.roll(d["logits"], 1, axis=-1)
    np.savez(bad, **d)
    with pytest.raises(SystemExit):
        golden.compare(str(ours), str(bad))


def _randomize_bn(model):
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, (torch.nn.BatchNorm2d, torch.nn.BatchNorm1d)):
                m.running_mean.uniform_(-0.2, 0.2)
                m.running_var.uniform_(0.7, 1.5)


@pytest.mark.slow
class TestGoldenBuilders:
    """Each PARITY.md command pair, end-to-end with a random-init
    'checkpoint': the tools/golden_builders.py torch side and the
    cream_tpu.cli.golden side must agree on the 4-image battery — on the
    weights-bearing machine the only new variable is the .pth itself."""

    # (builder fn, our model name, img, extra our-side args)
    CASES = [
        ("s3_tiny", "s3_tiny", 224, []),
        ("mini_swin_tiny", "mini_swin_tiny", 224, []),
        ("mini_deit_tiny", "mini_deit_tiny_patch16_224", 224, []),
        ("deit_small_rpe_k",
         "deit_small_patch16_224_ctx_product_50_shared_k", 224, []),
        ("autoformer_tiny", "autoformer_supernet_tiny", 224,
         ["--subnet-yaml",
          "/root/reference/AutoFormer/experiments/subnet/AutoFormer-T.yaml"]),
        ("cream_14", "cream_14", 64, []),
        ("cdarts_imagenet", "cdarts_retrain_imagenet", 224,
         ["--cells-json",
          "/root/reference/CDARTS/CDARTS/cells/imagenet_genotype.json"]),
        ("tinyclip_vit_39m_16_text_19m", "tinyclip_vit_39m_16_text_19m",
         224, []),
    ]

    @pytest.mark.parametrize("builder,ours_name,img,extra",
                             CASES, ids=[c[0] for c in CASES])
    def test_pair(self, tmp_path, builder, ours_name, img, extra):
        import golden_builders
        import golden_torch_side
        from cream_tpu.cli import golden

        torch.manual_seed(0)
        model = getattr(golden_builders, builder)()
        _randomize_bn(model)
        # iRPE lookup tables init to zeros — randomize so RPE mapping bugs
        # can't hide (same trick as the dedicated parity tests)
        with torch.no_grad():
            for n_, p in model.named_parameters():
                if "lookup_table" in n_ or "rel_pos" in n_:
                    p.normal_(std=0.05)
        ckpt = tmp_path / f"{builder}.pth"
        torch.save({"model": model.state_dict()}, ckpt)

        theirs = tmp_path / "theirs.npz"
        golden_torch_side.main(
            ["--model", builder, "--ckpt", str(ckpt), "--out", str(theirs),
             "--n", "4", "--img", str(img), "--builder",
             os.path.join(TOOLS, "golden_builders.py") + ":" + builder])

        ours = tmp_path / "ours.npz"
        golden.main(["--model", ours_name, "--torch-ckpt", str(ckpt),
                     "--dump", str(ours), "--n", "4", "--img", str(img)]
                    + extra)

        r = golden.compare(str(ours), str(theirs))
        assert r["top1_agree"] == 1.0
        assert r["maxdiff"] < 2e-3, r
