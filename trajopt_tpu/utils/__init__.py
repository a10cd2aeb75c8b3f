from trajopt_tpu.utils.tree import static_dataclass, pytree_dataclass, precise
from trajopt_tpu.utils.interp import interp_rows, line_trajectory
from trajopt_tpu.utils.logging import SolverLogger, print_al_history
from trajopt_tpu.utils.checkpoint import (
    save_result, load_result, save_pytree, load_leaves, warm_start,
)
from trajopt_tpu.utils.timing import Timer, timed_solve
