from m3p_tpu.train.optim import build_optimizer, parse_optim_spec, inverse_sqrt_schedule
from m3p_tpu.train.state import TrainState, create_train_state
