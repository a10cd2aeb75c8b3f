from trajopt_tpu.utils.tree import static_dataclass, pytree_dataclass
from trajopt_tpu.utils.interp import interp_rows, line_trajectory
