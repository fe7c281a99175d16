from .logger import Logger, attach_outputs
