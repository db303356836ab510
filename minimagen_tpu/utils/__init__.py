from . import profiling
from . import platform
