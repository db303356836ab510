from . import layers
from . import unet
from . import imagen
from . import t5

from .unet import UnetConfig, Unet, Base, Super, BaseTest, SuperTest
from .imagen import Imagen
