from .grid_sample import trilinear_sample
