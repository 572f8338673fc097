from cream_tpu.zoo.import_torch import (
    convert_tinyvit, convert_efficientvit, load_torch_state_dict)
