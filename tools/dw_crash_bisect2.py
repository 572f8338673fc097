"""Second-level bisect: full TinyViT train step with wgrad enabled for only
the stride-1 sites (MBConv) or only the stride-2 sites (PatchMerging).

  python tools/dw_crash_bisect2.py s1   # wgrad on s1, XLA on s2
  python tools/dw_crash_bisect2.py s2   # wgrad on s2, XLA on s1
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import cream_tpu.ops.dwconv as dw

which = sys.argv[1]
dw.DEFAULT_DW_VJP = "wgrad"
if which == "s1":
    dw.dw_conv3x3s2_auto = lambda x, w, mode=None: dw._dw2_fwd_raw(x, w)
elif which == "s2":
    dw.dw_conv3x3_auto = lambda x, w, mode=None: dw._dw_fwd_raw(x, w)
else:
    raise SystemExit("s1 or s2")

import bench  # noqa: E402

t0 = time.time()
r = bench.bench_train_step("tiny_vit_21m_224", 256)
print(f"wgrad-{which}-only: {r['items_per_s']} img/s "
      f"({time.time()-t0:.0f}s)  {r}", flush=True)
