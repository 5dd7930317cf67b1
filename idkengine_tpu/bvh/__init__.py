from .builder import BLAS, TLAS, NODE_DTYPE, native_available  # noqa: F401
