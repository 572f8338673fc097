from cream_tpu.zoo.import_torch import (
    convert_tinyvit, convert_efficientvit, convert_deit_rpe, convert_swin,
    convert_mini_swin, convert_mini_deit, convert_clip,
    convert_clip_classifier, convert_autoformer_supernet,
    convert_cream_childnet, convert_clip_pruned, normalize_clip_layout,
    load_torch_state_dict)
from cream_tpu.zoo.load import (convert_for_model, load_model_variables,
                                load_pruned_clip, load_cdarts_retrain, shape_template)
from cream_tpu.zoo.interpolate import (bicubic_resize_2d, remap_resolution,
                                       remap_leaf)
