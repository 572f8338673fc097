from cream_tpu.distill.logits_store import LogitsWriter, LogitsReader
from cream_tpu.distill.l0 import (
    L0Config, init_l0_params, sample_masks, lagrangian_loss, expected_sparsity,
    lambda_sign_mask)
from cream_tpu.distill.clip_losses import clip_contrastive_loss, clip_soft_loss
from cream_tpu.distill.weight_inherit import weight_inherit
