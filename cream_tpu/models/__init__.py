from cream_tpu.models import registry
from cream_tpu.models.registry import create_model, list_models, register_model

# Import model families for their registration side effects.
from cream_tpu.models import tinyvit  # noqa: F401
from cream_tpu.models import efficientvit  # noqa: F401
from cream_tpu.models import deit_rpe  # noqa: F401
from cream_tpu.models import autoformer  # noqa: F401
from cream_tpu.models import clip  # noqa: F401
from cream_tpu.models import swin  # noqa: F401
from cream_tpu.models import mini_deit  # noqa: F401
from cream_tpu.models import cream  # noqa: F401
from cream_tpu.models import darts  # noqa: F401
from cream_tpu.models import resnet  # noqa: F401
from cream_tpu.models import detr  # noqa: F401
from cream_tpu.models import nasbench201  # noqa: F401
from cream_tpu.models import retinanet  # noqa: F401
from cream_tpu.models import mask_rcnn  # noqa: F401
from cream_tpu.models import cydas_seg  # noqa: F401
