from . import mesh
from . import cascade
