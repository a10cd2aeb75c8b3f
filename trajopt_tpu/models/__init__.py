from trajopt_tpu.models.base import Model, DiscreteModel, discretize
from trajopt_tpu.models import zoo
