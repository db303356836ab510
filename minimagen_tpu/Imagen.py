"""Import-path parity shim: the reference exposes `minimagen.Imagen.Imagen`
(/root/reference/minimagen/Imagen.py); this module mirrors that path so
reference user code ports by renaming the package."""
from .models.imagen import Imagen  # noqa: F401
