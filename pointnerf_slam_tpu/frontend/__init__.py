from .features import HarrisExtractor, SuperPointExtractor
from .matching import match_two_way
from .epipolar import estimate_relative_pose_ransac
from .triangulate import triangulate_points, point_checks
from .pseudo_depth import splat_pseudo_depth
from .frontend import SparseFrontend
