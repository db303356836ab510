from . import dataset
from . import collate
from . import cache
