from .checkpoint import (  # noqa: F401
    latest_checkpoint,
    load_router_checkpoint,
    save_router_checkpoint,
)
from .metrics import MetricsLogger  # noqa: F401
