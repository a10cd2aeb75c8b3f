from trajopt_tpu.problems.zoo import PROBLEMS
from trajopt_tpu.problems import zoo
