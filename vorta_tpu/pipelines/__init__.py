from .wan_t2v import WanT2VPipeline, SamplingConfig  # noqa: F401
