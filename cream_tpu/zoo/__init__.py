from cream_tpu.zoo.import_torch import (
    convert_tinyvit, convert_efficientvit, convert_deit_rpe, convert_swin,
    convert_mini_swin, convert_clip, normalize_clip_layout,
    load_torch_state_dict)
