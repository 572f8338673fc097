"""A/B: MXU-routed BatchNorm backward (ops.bn.DEFAULT_MXU_BN) on TPU.

  python tools/bn_ab.py efficientvit_m5 512
  python tools/bn_ab.py tiny_vit_21m_224 256
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import cream_tpu.ops.bn as bn_ops
import bench

model = sys.argv[1] if len(sys.argv) > 1 else "efficientvit_m5"
batch = int(sys.argv[2]) if len(sys.argv) > 2 else 512

for flag in (False, True):
    bn_ops.DEFAULT_MXU_BN = flag
    t0 = time.time()
    r = bench.bench_train_step(model, batch)
    print(f"train {model} mxu_bn={flag}: {r['items_per_s']} img/s "
          f"({time.time()-t0:.0f}s)", flush=True)
