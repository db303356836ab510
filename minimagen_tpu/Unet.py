"""Import-path parity shim for `minimagen.Unet` (reference Unet.py exports
Unet, Base, Super, BaseTest, SuperTest)."""
from .models.unet import (  # noqa: F401
    Base,
    BaseTest,
    Super,
    SuperTest,
    Unet,
    UnetConfig,
    UnetModel,
)
