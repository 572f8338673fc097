from cream_tpu.nn.layers import ConvBN, BNLinear, MBConv, MlpLN, DropPathModule
from cream_tpu.nn.attention import BiasAttention
