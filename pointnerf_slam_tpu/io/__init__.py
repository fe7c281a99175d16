from .config import load_config, update_recursive, DEFAULT_CONFIG
from .datasets import get_dataset
