from .mapping import (make_sharded_mapping_step, make_shardmap_mapper_step,
                      make_mesh)
