from cream_tpu.zoo.import_torch import (
    convert_tinyvit, convert_efficientvit, convert_deit_rpe,
    load_torch_state_dict)
