from .trace import SceneArrays, trace_any, trace_closest  # noqa: F401
