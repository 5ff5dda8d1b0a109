from .conditional import ConditionalFlowSpec  # noqa: F401
from .flownet import FlowNetSpec, LevelSpec  # noqa: F401
from .flowstep import FlowStepSpec  # noqa: F401
