from m3p_tpu.utils.schedules import LambdaSchedule, parse_lambda_config, update_lambdas
from m3p_tpu.utils.sampling import set_sampling_probs, shuf_order
from m3p_tpu.utils.logging import create_logger, initialize_exp
from m3p_tpu.utils.metrics import SpeedMeter, StatsAccumulator
