from msom_tpu.parallel.mesh import (make_mesh, shard_model, field_sharding,
                                    replicated)

__all__ = ["make_mesh", "shard_model", "field_sharding", "replicated"]
