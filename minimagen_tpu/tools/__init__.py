from . import torch_import
