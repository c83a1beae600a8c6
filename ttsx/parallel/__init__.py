from ttsx.parallel.data_parallel import (
    make_dp_mesh, shard_batch_dp, replicate, dp_synthesis, dp_train_step)
