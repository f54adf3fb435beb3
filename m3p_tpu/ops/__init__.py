from m3p_tpu.ops.attention import (
    attention,
    flash_attention,
    mha_reference,
)
from m3p_tpu.ops.activations import gelu_erf
