from cream_tpu.train.state import TrainState
from cream_tpu.train.steps import make_train_step, make_eval_step
from cream_tpu.train.optim import make_adamw, make_sgd, cosine_schedule
from cream_tpu.train.metrics import AverageMeter, MetricLogger, topk_accuracy_counts
