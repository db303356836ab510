from . import diffusion
from . import helpers
from . import resize
from . import attention
