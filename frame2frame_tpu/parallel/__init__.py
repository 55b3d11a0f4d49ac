from .mesh import make_mesh, replicated, shard_video, video_sharding
from .shard import make_sharded_f2f_step, make_sharded_sup_step
from .spatial import (
    frame_sharding,
    make_space_mesh,
    make_spatial_online_step,
)
