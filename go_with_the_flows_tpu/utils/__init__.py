from .meters import AverageMeter
from .config import load_config, resolve_config, count_params
