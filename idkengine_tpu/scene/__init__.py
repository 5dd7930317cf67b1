from .gltf import load_gltf  # noqa: F401
from .model import Material, MeshPrimitive, Model, Node  # noqa: F401
