from .camera import Camera  # noqa: F401
from .pathtracer import PathTracer, PathTracerSettings  # noqa: F401
