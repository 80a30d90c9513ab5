from .render import (make_ray_mesh, replicate_spec, shard_rays,
                     render_sharded, make_train_step)
