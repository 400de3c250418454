from .optim import gpt_adamw, decay_mask  # noqa: F401
from .checkpoint import CheckpointManager  # noqa: F401
from .logging import TBLogger  # noqa: F401
