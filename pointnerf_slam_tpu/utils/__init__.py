from .timer import Timer, TimerFps, MovingAverage
from .printer import Printer, get_logger
