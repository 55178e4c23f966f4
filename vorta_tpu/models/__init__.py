from .router import Router  # noqa: F401
from .wan import WanModel, WanBlock  # noqa: F401
