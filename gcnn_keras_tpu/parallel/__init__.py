from .mesh import make_mesh, stack_batches, shard_stacked_batch
from .data_parallel import make_dp_train_step, make_dp_eval_step
