from immunostruct_tpu.ops.nnp import (
    linear_init, linear_apply, mlp_init, dropout,
    DEFAULT_PARAM_DTYPE,
)
from immunostruct_tpu.ops.attention import (
    self_attention_init, self_attention_apply,
    mha_init, mha_apply,
)
from immunostruct_tpu.ops.pooling import mean_pool, max_pool, masked_mean_pool, masked_max_pool
from immunostruct_tpu.ops.egnn import (
    egnn_init, egnn_apply, egnn_stack_init, egnn_stack_apply,
    build_scatter_matrix,
)
