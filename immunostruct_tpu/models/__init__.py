from immunostruct_tpu.models.trunk import (
    ModelSpec, model_init, model_apply, model_apply_comparative,
    reset_head, ModelOutput,
)
from immunostruct_tpu.models.zoo import model_map, build_model
