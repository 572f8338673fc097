"""Analytic FLOPs / params tables for the Cream supernet search space.

Rebuild of Cream/lib/utils/flops_table.py:11-76 (FlopsEst): a per-(layer,
choice) grid of MACs so the train loop can prefilter paths by FLOPs window
without running the model, and search_for_layer's per-stage depth sizing
(search_structure_supernet.py:6-44) expressed as a helper.
"""
from __future__ import annotations

import numpy as np

from cream_tpu.models.cream import CHOICES, SEARCH_STAGES


def inverted_residual_macs(in_chs: int, out_chs: int, k: int, e: int,
                           stride: int, in_hw: int, se_ratio: float = 0.25
                           ) -> int:
    mid = in_chs * e
    out_hw = in_hw // stride
    macs = in_hw * in_hw * in_chs * mid                # 1x1 expand
    macs += out_hw * out_hw * mid * k * k              # depthwise kxk
    rd = max(1, int(in_chs * se_ratio))                # squeeze-excite
    macs += mid * rd * 2
    macs += out_hw * out_hw * mid * out_chs            # 1x1 project
    return macs


def build_flops_table(img_size: int = 224, stem_chs: int = 16,
                      stages=SEARCH_STAGES) -> np.ndarray:
    """(num_layers, num_choices) MACs grid for the searchable layers."""
    hw = img_size // 2          # after the stride-2 stem
    in_chs = 16                 # after the fixed ds block
    rows = []
    for chs, depth, stride in stages:
        for i in range(depth):
            s = stride if i == 0 else 1
            layer_in = in_chs if i == 0 else chs
            rows.append([inverted_residual_macs(layer_in, chs, k, e, s, hw)
                         for (k, e) in CHOICES])
            if i == 0:
                hw //= stride
        in_chs = chs
    return np.asarray(rows, np.int64)


def arch_flops(arch, table: np.ndarray, base_macs: int = 40_000_000) -> int:
    """Total MACs of a path: fixed stem/head base + per-layer table lookups
    (FlopsEst.get_flops semantics; -1 layers contribute zero)."""
    total = base_macs
    for li, op in enumerate(np.asarray(arch).ravel()):
        if op >= 0:
            total += int(table[li, int(op)])
    return total
