from .flow_match import FlowMatchEulerSchedule  # noqa: F401
