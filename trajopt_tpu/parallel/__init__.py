from trajopt_tpu.parallel.riccati import parallel_backward_pass
from trajopt_tpu.parallel.batch import (
    solve_batch, solve_batch_queued, solve_batch_queued_altro,
    solve_batch_warm, solve_batch_sharded, make_mesh, BatchStats,
)
