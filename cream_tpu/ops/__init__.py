from cream_tpu.ops.window import window_partition, window_reverse
from cream_tpu.ops.common import drop_path, attention_bias_indices
from cream_tpu.ops.fuse import fold_conv_bn, fold_bn_linear
