from .hcflow_rescaling import HCFlowRescalingSpec  # noqa: F401
from .hcflow_sr import HCFlowSRSpec  # noqa: F401
