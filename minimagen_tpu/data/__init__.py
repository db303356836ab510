from . import dataset
from . import collate
