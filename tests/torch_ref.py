"""Load reference PyTorch models as *test oracles* (never imported by the
framework itself). timm isn't installed, so a minimal stub provides the few
symbols the reference model files import.

The stub's SqueezeExcite mirrors real timm (conv_reduce/conv_expand names,
make_divisible rounding) so state_dict layouts match released checkpoints.
"""
import importlib.util
import sys
import types

import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402

REFERENCE = "/root/reference"


def _make_divisible(v, divisor=8, min_value=None):
    min_value = min_value or divisor
    new_v = max(min_value, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


class _DropPath(nn.Module):
    def __init__(self, drop_prob=None):
        super().__init__()
        self.drop_prob = drop_prob

    def forward(self, x):
        if not self.training or not self.drop_prob:
            return x
        keep = 1 - self.drop_prob
        mask = torch.rand(x.shape[0], *([1] * (x.ndim - 1))) < keep
        return x * mask / keep


class _SqueezeExcite(nn.Module):
    def __init__(self, channels, rd_ratio=1 / 16, rd_channels=None, rd_divisor=8,
                 **kw):
        super().__init__()
        if rd_channels is None:
            rd_channels = _make_divisible(channels * rd_ratio, rd_divisor)
        self.conv_reduce = nn.Conv2d(channels, rd_channels, 1, bias=True)
        self.act1 = nn.ReLU(inplace=True)
        self.conv_expand = nn.Conv2d(rd_channels, channels, 1, bias=True)
        self.gate = nn.Sigmoid()

    def forward(self, x):
        s = x.mean((2, 3), keepdim=True)
        s = self.conv_expand(self.act1(self.conv_reduce(s)))
        return x * self.gate(s)


def _to_2tuple(x):
    return x if isinstance(x, tuple) else (x, x)


class _Mlp(nn.Module):
    """timm 0.3.2 Mlp: fc1 -> GELU -> drop -> fc2 -> drop."""

    def __init__(self, in_features, hidden_features=None, out_features=None,
                 act_layer=nn.GELU, drop=0.0):
        super().__init__()
        out_features = out_features or in_features
        hidden_features = hidden_features or in_features
        self.fc1 = nn.Linear(in_features, hidden_features)
        self.act = act_layer()
        self.fc2 = nn.Linear(hidden_features, out_features)
        self.drop = nn.Dropout(drop)

    def forward(self, x):
        return self.drop(self.fc2(self.drop(self.act(self.fc1(x)))))


class _PatchEmbed(nn.Module):
    """timm 0.3.2 PatchEmbed: conv proj then flatten tokens."""

    def __init__(self, img_size=224, patch_size=16, in_chans=3, embed_dim=768):
        super().__init__()
        img_size = _to_2tuple(img_size)
        patch_size = _to_2tuple(patch_size)
        self.num_patches = (img_size[0] // patch_size[0]) * \
            (img_size[1] // patch_size[1])
        self.proj = nn.Conv2d(in_chans, embed_dim, kernel_size=patch_size,
                              stride=patch_size)

    def forward(self, x):
        return self.proj(x).flatten(2).transpose(1, 2)


def install_timm_stub():
    if "timm" in sys.modules:
        return
    timm = types.ModuleType("timm")
    timm.__version__ = "0.9.0"
    models = types.ModuleType("timm.models")
    layers = types.ModuleType("timm.models.layers")
    layers.DropPath = _DropPath
    layers.to_2tuple = _to_2tuple
    layers.trunc_normal_ = nn.init.trunc_normal_
    layers.SqueezeExcite = _SqueezeExcite
    registry = types.ModuleType("timm.models.registry")
    registry.register_model = lambda f: f
    vit = types.ModuleType("timm.models.vision_transformer")
    vit.trunc_normal_ = nn.init.trunc_normal_
    vit._cfg = lambda url="", **kw: dict(url=url, **kw)
    vit.default_cfgs = {}
    vit.Mlp = _Mlp
    vit.PatchEmbed = _PatchEmbed
    vit.HybridEmbed = None  # only referenced when hybrid_backbone is used
    data = types.ModuleType("timm.data")
    data.IMAGENET_DEFAULT_MEAN = (0.485, 0.456, 0.406)
    data.IMAGENET_DEFAULT_STD = (0.229, 0.224, 0.225)
    helpers = types.ModuleType("timm.models.helpers")
    helpers.load_pretrained = lambda *a, **k: None
    resnet = types.ModuleType("timm.models.resnet")
    resnet.resnet26d = resnet.resnet50d = lambda *a, **k: None
    builder = types.ModuleType("timm.models._builder")

    def build_model_with_cfg(cls, variant, pretrained, pretrained_cfg=None,
                             pretrained_filter_fn=None, **kwargs):
        assert not pretrained, "oracle models are random-init only"
        return cls(**kwargs)

    builder.build_model_with_cfg = build_model_with_cfg
    models.layers = layers
    models.registry = registry
    models.vision_transformer = vit
    models._builder = builder
    models.helpers = helpers
    models.resnet = resnet
    timm.models = models
    timm.data = data
    sys.modules.update({
        "timm": timm, "timm.models": models, "timm.models.layers": layers,
        "timm.models.registry": registry,
        "timm.models.vision_transformer": vit, "timm.models._builder": builder,
        "timm.models.helpers": helpers, "timm.models.resnet": resnet,
        "timm.data": data,
    })


def install_easydict_stub():
    if "easydict" in sys.modules:
        return
    mod = types.ModuleType("easydict")

    class EasyDict(dict):
        def __getattr__(self, k):
            try:
                return self[k]
            except KeyError as e:
                raise AttributeError(k) from e

        def __setattr__(self, k, v):
            self[k] = v

    mod.EasyDict = EasyDict
    sys.modules["easydict"] = mod


def load_ref_module(relpath: str, name: str):
    """Import a reference .py file as a standalone module (timm stubbed)."""
    install_timm_stub()
    spec = importlib.util.spec_from_file_location(name, f"{REFERENCE}/{relpath}")
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def state_dict_numpy(model) -> dict:
    return {k: v.detach().numpy() for k, v in model.state_dict().items()}


def install_torchvision_stub():
    """Minimal torchvision stub for DETR's util.misc / util.box_ops."""
    if "torchvision" in sys.modules:
        return
    tv = types.ModuleType("torchvision")
    tv.__version__ = "0.15.0"
    tv._is_tracing = lambda: False
    ops = types.ModuleType("torchvision.ops")
    boxes = types.ModuleType("torchvision.ops.boxes")

    def box_area(b):
        return (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])

    boxes.box_area = box_area
    ops.boxes = boxes
    misc = types.ModuleType("torchvision.ops.misc")
    ops.misc = misc
    tv.ops = ops
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.ops"] = ops
    sys.modules["torchvision.ops.boxes"] = boxes
    sys.modules["torchvision.ops.misc"] = misc


_DETR_ROOT = f"{REFERENCE}/iRPE/DETR-with-iRPE"


def load_detr_rpe_attention():
    """Import the reference rpe_attention package (torch-only)."""
    install_easydict_stub()
    if "rpe_attention" in sys.modules:
        return sys.modules["rpe_attention"]
    pkg_dir = f"{_DETR_ROOT}/models/rpe_attention"
    spec = importlib.util.spec_from_file_location(
        "rpe_attention", f"{pkg_dir}/__init__.py",
        submodule_search_locations=[pkg_dir])
    pkg = importlib.util.module_from_spec(spec)
    sys.modules["rpe_attention"] = pkg
    spec.loader.exec_module(pkg)
    return pkg


def load_detr_module(name: str):
    """Import a DETR-root module ('models.transformer', 'models.matcher',
    'util.box_ops', ...) with its sibling packages resolvable."""
    install_easydict_stub()
    install_torchvision_stub()
    if _DETR_ROOT not in sys.path:
        sys.path.insert(0, _DETR_ROOT)
    # the DETR models/__init__ imports the full detection stack; shadow it
    # with a namespace package so only the requested submodule executes
    for pkg_name in ("models", "util"):
        if pkg_name not in sys.modules:
            pkg = types.ModuleType(pkg_name)
            pkg.__path__ = [f"{_DETR_ROOT}/{pkg_name}"]
            sys.modules[pkg_name] = pkg
    sys.modules.setdefault("models.rpe_attention", load_detr_rpe_attention())
    return importlib.import_module(name)


def install_timm_efficientnet_stub():
    """timm.models.efficientnet_blocks + layers the Cream childnet builder
    imports (timm ~0.3-era public API, re-implemented; the reference vendors
    the IR block itself in lib/models/blocks/inverted_residual_block.py and
    that real file is loaded on top of this stub)."""
    install_timm_stub()
    import math
    import re as _re
    from copy import deepcopy
    from collections import OrderedDict
    import torch
    import torch.nn.functional as F

    if "timm.models.efficientnet_blocks" in sys.modules:
        return

    def sigmoid(x, inplace=False):
        return x.sigmoid()

    def hard_sigmoid(x, inplace=False):
        return F.relu6(x + 3.0) / 6.0

    class Swish(nn.Module):
        def __init__(self, inplace=False):
            super().__init__()

        def forward(self, x):
            return x * torch.sigmoid(x)

    def make_divisible(v, divisor=8, min_value=None):
        min_value = min_value or divisor
        new_v = max(min_value, int(v + divisor / 2) // divisor * divisor)
        if new_v < 0.9 * v:
            new_v += divisor
        return new_v

    def round_channels(channels, multiplier=1.0, divisor=8, channel_min=None):
        if not multiplier:
            return channels
        return make_divisible(channels * multiplier, divisor, channel_min)

    def get_padding(kernel_size, stride=1, dilation=1):
        return ((stride - 1) + dilation * (kernel_size - 1)) // 2

    def create_conv2d(in_chs, out_chs, kernel_size, stride=1, dilation=1,
                      padding="", depthwise=False, bias=False, **kw):
        groups = in_chs if depthwise else 1
        pad = padding if isinstance(padding, int) else \
            get_padding(kernel_size, stride, dilation)
        return nn.Conv2d(in_chs, out_chs, kernel_size, stride, pad, dilation,
                         groups=groups, bias=bias)

    _SE_ARGS_DEFAULT = dict(gate_fn=sigmoid, act_layer=None,
                            reduce_mid=False, divisor=1)

    def resolve_se_args(kwargs, in_chs, act_layer=None):
        se_kwargs = kwargs.copy() if kwargs is not None else {}
        for k, v in _SE_ARGS_DEFAULT.items():
            se_kwargs.setdefault(k, v)
        if not se_kwargs.pop("reduce_mid"):
            se_kwargs["reduced_base_chs"] = in_chs
        if se_kwargs["act_layer"] is None:
            se_kwargs["act_layer"] = act_layer
        return se_kwargs

    def resolve_bn_args(kwargs):
        out = {}
        if kwargs.get("bn_momentum") is not None:
            out["momentum"] = kwargs["bn_momentum"]
        if kwargs.get("bn_eps") is not None:
            out["eps"] = kwargs["bn_eps"]
        return out

    def drop_path(x, drop_prob=0.0, training=False):
        if drop_prob == 0.0 or not training:
            return x
        keep = 1 - drop_prob
        mask = keep + torch.rand((x.shape[0], 1, 1, 1), dtype=x.dtype)
        return x.div(keep) * mask.floor_()

    class SqueezeExcite(nn.Module):
        def __init__(self, in_chs, se_ratio=0.25, reduced_base_chs=None,
                     act_layer=nn.ReLU, gate_fn=sigmoid, divisor=1, **_):
            super().__init__()
            reduced = make_divisible((reduced_base_chs or in_chs) * se_ratio,
                                     divisor)
            self.conv_reduce = nn.Conv2d(in_chs, reduced, 1, bias=True)
            self.act1 = act_layer(inplace=True)
            self.conv_expand = nn.Conv2d(reduced, in_chs, 1, bias=True)
            self.gate_fn = gate_fn

        def forward(self, x):
            s = x.mean((2, 3), keepdim=True)
            s = self.conv_expand(self.act1(self.conv_reduce(s)))
            return x * self.gate_fn(s)

    class ConvBnAct(nn.Module):
        def __init__(self, in_chs, out_chs, kernel_size, stride=1, dilation=1,
                     pad_type="", act_layer=nn.ReLU,
                     norm_layer=nn.BatchNorm2d, norm_kwargs=None, **_):
            super().__init__()
            self.conv = create_conv2d(in_chs, out_chs, kernel_size, stride,
                                      dilation, pad_type)
            self.bn1 = norm_layer(out_chs, **(norm_kwargs or {}))
            self.act1 = act_layer(inplace=True)

        def feature_module(self, location):
            return ""

        def feature_channels(self, location):
            return self.conv.out_channels

        def forward(self, x):
            return self.act1(self.bn1(self.conv(x)))

    class DepthwiseSeparableConv(nn.Module):
        def __init__(self, in_chs, out_chs, dw_kernel_size=3, stride=1,
                     dilation=1, pad_type="", act_layer=nn.ReLU, noskip=False,
                     pw_kernel_size=1, pw_act=False, se_ratio=0.0,
                     se_kwargs=None, norm_layer=nn.BatchNorm2d,
                     norm_kwargs=None, drop_path_rate=0.0, **_):
            super().__init__()
            norm_kwargs = norm_kwargs or {}
            self.has_residual = (stride == 1 and in_chs == out_chs) and not noskip
            self.drop_path_rate = drop_path_rate
            self.conv_dw = create_conv2d(in_chs, in_chs, dw_kernel_size,
                                         stride, dilation, pad_type,
                                         depthwise=True)
            self.bn1 = norm_layer(in_chs, **norm_kwargs)
            self.act1 = act_layer(inplace=True)
            if se_ratio is not None and se_ratio > 0.0:
                se_kwargs = resolve_se_args(se_kwargs, in_chs, act_layer)
                self.se = SqueezeExcite(in_chs, se_ratio=se_ratio, **se_kwargs)
            else:
                self.se = None
            self.conv_pw = create_conv2d(in_chs, out_chs, pw_kernel_size,
                                         padding=pad_type)
            self.bn2 = norm_layer(out_chs, **norm_kwargs)
            self.act2 = act_layer(inplace=True) if pw_act else nn.Identity()

        def feature_module(self, location):
            return ""

        def feature_channels(self, location):
            return self.conv_pw.out_channels

        def forward(self, x):
            residual = x
            x = self.act1(self.bn1(self.conv_dw(x)))
            if self.se is not None:
                x = self.se(x)
            x = self.act2(self.bn2(self.conv_pw(x)))
            if self.has_residual:
                if self.drop_path_rate > 0.0:
                    x = drop_path(x, self.drop_path_rate, self.training)
                x += residual
            return x

    eb = types.ModuleType("timm.models.efficientnet_blocks")
    eb.sigmoid = sigmoid
    eb.hard_sigmoid = hard_sigmoid
    eb.make_divisible = make_divisible
    eb.round_channels = round_channels
    eb.create_conv2d = create_conv2d
    eb.resolve_se_args = resolve_se_args
    eb.resolve_bn_args = resolve_bn_args
    eb.drop_path = drop_path
    eb.SqueezeExcite = SqueezeExcite
    eb.ConvBnAct = ConvBnAct
    eb.DepthwiseSeparableConv = DepthwiseSeparableConv

    class SelectAdaptivePool2d(nn.Module):
        def __init__(self, output_size=1, pool_type="avg", flatten=False):
            super().__init__()
            self.flatten = flatten

        def feat_mult(self):
            return 1

        def forward(self, x):
            x = x.mean((2, 3), keepdim=True)
            return x.flatten(1) if self.flatten else x

    class CondConv2d(nn.Module):
        pass

    layers = sys.modules["timm.models.layers"]
    layers.create_conv2d = create_conv2d
    layers.SelectAdaptivePool2d = SelectAdaptivePool2d
    layers.CondConv2d = CondConv2d
    layers.get_condconv_initializer = lambda *a, **k: (lambda w: None)
    acts = types.ModuleType("timm.models.layers.activations")
    acts.Swish = Swish
    acts.hard_sigmoid = hard_sigmoid
    acts.sigmoid = sigmoid
    layers.activations = acts

    tutils = types.ModuleType("timm.utils")
    tutils.deepcopy = deepcopy
    tutils.OrderedDict = OrderedDict
    tutils.math = math
    tutils.re = _re

    class AverageMeter:
        def __init__(self):
            self.avg = self.sum = self.count = 0

        def update(self, val, n=1):
            self.sum += val * n
            self.count += n
            self.avg = self.sum / max(1, self.count)

    tutils.AverageMeter = AverageMeter
    sys.modules["timm"].utils = tutils
    sys.modules.update({
        "timm.models.efficientnet_blocks": eb,
        "timm.models.layers.activations": acts,
        "timm.utils": tutils,
    })


def load_cream_childnet_module():
    """Import the reference Cream childnet stack (childnet.py +
    build_childnet.py + builder_util.py, all real reference code; plus the
    vendored IR block) against the timm stub. Returns the childnet module
    (gen_childnet, ChildNet)."""
    if "ref_cream_childnet" in sys.modules:
        return sys.modules["ref_cream_childnet"]
    install_timm_efficientnet_stub()
    from collections import OrderedDict

    croot = f"{REFERENCE}/Cream/lib"
    for name in ("lib", "lib.utils", "lib.models", "lib.models.builders",
                 "lib.models.structures", "lib.models.blocks"):
        if name not in sys.modules:
            pkg = types.ModuleType(name)
            pkg.__path__ = []
            sys.modules[name] = pkg

    util = types.ModuleType("lib.utils.util")
    util.nn = nn
    util.OrderedDict = OrderedDict
    sys.modules["lib.utils.util"] = util

    def _load(relpath, modname):
        spec = importlib.util.spec_from_file_location(
            modname, f"{croot}/{relpath}")
        mod = importlib.util.module_from_spec(spec)
        sys.modules[modname] = mod
        spec.loader.exec_module(mod)
        return mod

    _load("utils/builder_util.py", "lib.utils.builder_util")
    # the vendored (real reference) IR block replaces any stub version
    irb = _load("models/blocks/inverted_residual_block.py",
                "lib.models.blocks.inverted_residual_block")
    sys.modules["timm.models.efficientnet_blocks"].InvertedResidual = \
        irb.InvertedResidual
    bc = _load("models/builders/build_childnet.py",
               "lib.models.builders.build_childnet")
    bc.InvertedResidual = irb.InvertedResidual
    return _load("models/structures/childnet.py", "ref_cream_childnet")


def load_tinyclip_module():
    """Import the reference TinyCLIP open_clip/model.py live (relative deps
    stubbed where heavyweight: .utils torchvision bits, .timm_model)."""
    if "refoc.model" in sys.modules:
        return sys.modules["refoc.model"]
    install_timm_stub()
    pkg_dir = f"{REFERENCE}/TinyCLIP/src/open_clip"
    pkg = types.ModuleType("refoc")
    pkg.__path__ = [pkg_dir]
    sys.modules["refoc"] = pkg
    u = types.ModuleType("refoc.utils")
    u.freeze_batch_norm_2d = lambda *a, **k: None
    u.to_2tuple = lambda x: x if isinstance(x, tuple) else (x, x)
    sys.modules["refoc.utils"] = u
    tm = types.ModuleType("refoc.timm_model")
    tm.TimmModel = type("TimmModel", (), {})
    sys.modules["refoc.timm_model"] = tm
    return importlib.import_module("refoc.model")


def load_cdarts_model_test():
    """Import the reference CDARTS retrain stack live (model_test.py +
    augment_cells.py + ops.py + genotypes.py, all real reference code)."""
    if "lib.models.model_test" in sys.modules:
        return sys.modules["lib.models.model_test"]
    croot = f"{REFERENCE}/CDARTS/lib"
    for name in ("lib", "lib.utils", "lib.models"):
        if name not in sys.modules:
            pkg = types.ModuleType(name)
            pkg.__path__ = []
            sys.modules[name] = pkg

    def _load(relpath, modname):
        spec = importlib.util.spec_from_file_location(
            modname, f"{croot}/{relpath}")
        mod = importlib.util.module_from_spec(spec)
        sys.modules[modname] = mod
        parent, _, leaf = modname.rpartition(".")
        spec.loader.exec_module(mod)
        setattr(sys.modules[parent], leaf, mod)
        return mod

    _load("models/ops.py", "lib.models.ops")
    _load("utils/genotypes.py", "lib.utils.genotypes")
    _load("models/augment_cells.py", "lib.models.augment_cells")
    return _load("models/model_test.py", "lib.models.model_test")


def load_cydas_seg_module():
    """Import the reference CyDASseg segmentation stack live
    (CDARTS/CDARTS_segmentation/train/{cydas,builder,operations,seg_oprs,
    att_sa,slimmable_ops,genotypes}.py — all real reference code). The
    modules import each other by flat name, so they are registered flat.
    Stubs: thop (latency profiler, unused at eval), torch._six (removed in
    modern torch), utils.darts_utils (TensorRT latency helpers), and
    layers.NaiveSyncBatchNorm -> nn.BatchNorm2d (identical math in a single
    process)."""
    if "ref_cydas" in sys.modules:
        return sys.modules["ref_cydas"]
    install_easydict_stub()
    import collections.abc
    if "thop" not in sys.modules:
        thop = types.ModuleType("thop")
        thop.profile = lambda *a, **k: (0.0, 0.0)
        sys.modules["thop"] = thop
    if "torch._six" not in sys.modules:
        six = types.ModuleType("torch._six")
        six.container_abcs = collections.abc
        six.int_classes = int
        six.string_classes = str
        sys.modules["torch._six"] = six
    if "utils.darts_utils" not in sys.modules:
        upkg = types.ModuleType("utils")
        upkg.__path__ = []
        du = types.ModuleType("utils.darts_utils")
        du.compute_latency_ms_tensorrt = lambda *a, **k: 0.0
        du.compute_latency_ms_pytorch = lambda *a, **k: 0.0
        upkg.darts_utils = du
        sys.modules["utils"] = upkg
        sys.modules["utils.darts_utils"] = du
    if "layers" not in sys.modules:
        lay = types.ModuleType("layers")
        lay.NaiveSyncBatchNorm = nn.BatchNorm2d
        sys.modules["layers"] = lay

    sroot = "CDARTS/CDARTS_segmentation/train"
    for leaf in ("slimmable_ops", "operations", "genotypes", "att_sa",
                 "seg_oprs", "builder"):
        if leaf not in sys.modules:
            load_ref_module(f"{sroot}/{leaf}.py", leaf)
    mod = load_ref_module(f"{sroot}/cydas.py", "ref_cydas")
    return mod
