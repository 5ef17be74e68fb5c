from goi_tpu.dist.mesh import make_mesh, shard_scene, scene_sharding
from goi_tpu.dist.shard import make_sharded_distill_step

__all__ = ["make_mesh", "shard_scene", "scene_sharding",
           "make_sharded_distill_step"]
