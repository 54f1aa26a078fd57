from immunostruct_tpu.parallel.mesh import (
    make_mesh, batch_sharding, replicated_sharding, shard_batch, replicate_tree,
)
from immunostruct_tpu.parallel.collectives import (
    psum, pmean, pmax, all_gather, ppermute_ring,
)
from immunostruct_tpu.parallel.trainer import make_sharded_trainer, shard_map_train_step
