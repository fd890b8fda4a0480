from pdecontrol_tpu.envs.kuramoto import KuramotoSivashinsky, EnvState, StepOut  # noqa: F401
from pdecontrol_tpu.envs.burgers import Burgers  # noqa: F401
from pdecontrol_tpu.envs import transforms  # noqa: F401
