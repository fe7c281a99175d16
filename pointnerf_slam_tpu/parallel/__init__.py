from .mapping import make_sharded_mapping_step, make_mesh
