from cream_tpu.data.mixup import mixup_cutmix
from cream_tpu.data.transforms import (
    eval_preprocess_config, IMAGENET_MEAN, IMAGENET_STD, CLIP_MEAN, CLIP_STD)
