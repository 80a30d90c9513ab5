from .render import (make_ray_mesh, replicate_spec, shard_rays,
                     render_sharded, make_train_step,
                     shard_pool, unshard_pool, render_pool_sharded,
                     make_pool_train_step, shard_baked,
                     shard_tape, replay_sharded, make_tape_train_step)
from .distributed import (initialize, is_multi_process, global_ray_mesh,
                          shard_global_rays, replicate_global)
