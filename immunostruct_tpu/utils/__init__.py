from immunostruct_tpu.utils.losses import LossConfig, regression_loss, bce_loss, make_loss_fn
from immunostruct_tpu.utils.contrastive import (
    paired_contrastive_init, paired_contrastive_loss,
)
from immunostruct_tpu.utils.schedule import linear_warmup_cosine_annealing
from immunostruct_tpu.utils.checkpoint import save_checkpoint, load_checkpoint
from immunostruct_tpu.utils.seeding import seed_everything
