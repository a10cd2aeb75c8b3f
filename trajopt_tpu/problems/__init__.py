from trajopt_tpu.problems.zoo import PROBLEMS
from trajopt_tpu.problems import zoo
from trajopt_tpu.problems.tuned import TUNED_ALTRO, tuned_altro_options
