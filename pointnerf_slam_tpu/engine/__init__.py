from .state import EngineConfig, KeyframeBuffer
from .mapper import make_mapper_step
from .tracker import make_tracking_step
from .system import PointNeRFSLAM
