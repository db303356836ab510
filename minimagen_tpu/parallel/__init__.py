from . import mesh
from . import cascade
from . import multihost
