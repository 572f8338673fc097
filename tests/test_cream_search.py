"""search_for_layer parity vs the reference (run live) + flops_op_dict shape.

The reference Cream/lib/utils/search_structure_supernet.py is dependency-free
pure Python, so it is imported directly as the oracle.
"""
import importlib.util

import numpy as np
import pytest

from cream_tpu.nas.flops import (SEARCH_STAGES, arch_flops,
                                 build_flops_op_dict, build_flops_table,
                                 search_for_layer, sized_stages)

REF = "/root/reference/Cream/lib/utils/search_structure_supernet.py"


def ref_search_for_layer():
    spec = importlib.util.spec_from_file_location("ref_sss", REF)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.search_for_layer


ARCH_DEF = [[0]] + [[0] * d for _, d, _ in SEARCH_STAGES] + [[0]]


@pytest.mark.parametrize("window", [
    (15e6, 60e6), (50e6, 100e6), (100e6, 300e6), (300e6, 600e6),
    (5e6, 10e6), (1e9, 2e9), (1e4, 2e4),
])
def test_search_for_layer_matches_reference(window):
    ref = ref_search_for_layer()
    op_dict = build_flops_op_dict(224)
    got_sta, got_res = search_for_layer(op_dict, *window)
    exp_sta, _, exp_res = ref(op_dict, ARCH_DEF, *window)
    assert got_sta == exp_sta
    assert got_res == exp_res


def test_search_for_layer_matches_reference_random_tables():
    ref = ref_search_for_layer()
    rng = np.random.default_rng(0)
    for _ in range(25):
        op_dict = [[(int(rng.integers(1e5, 5e7)), int(rng.integers(1e5, 5e7)))
                    for _ in range(6)] for _ in range(5)]
        lo = float(rng.uniform(1e6, 3e8))
        hi = lo * float(rng.uniform(1.1, 5.0))
        got_sta, got_res = search_for_layer(op_dict, lo, hi)
        exp_sta, _, exp_res = ref(op_dict, ARCH_DEF, lo, hi)
        assert got_sta == exp_sta and got_res == exp_res


def test_flops_op_dict_consistent_with_table():
    op_dict = build_flops_op_dict(224)
    table = build_flops_table(224)
    assert len(op_dict) == 5 and all(len(row) == 6 for row in op_dict)
    row = 0
    for si, (_, depth, _) in enumerate(SEARCH_STAGES):
        for c in range(6):
            assert op_dict[si][c][0] == int(table[row][c])
        row += depth


def test_sized_stages_and_flops_budget():
    op_dict = build_flops_op_dict(224)
    sta, res = search_for_layer(op_dict, 50e6, 600e6)
    assert sta is not None
    stages = sized_stages(sta)
    assert [d for _, d, _ in stages] == sta
    # a max-choice path through the sized supernet respects the window order
    table = build_flops_table(224, stages=stages)
    arch = np.full((sum(sta),), 5, np.int64)
    assert arch_flops(arch, table) > 50e6
