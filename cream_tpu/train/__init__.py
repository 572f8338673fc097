from cream_tpu.train.state import TrainState
from cream_tpu.train.steps import make_train_step, make_eval_step
