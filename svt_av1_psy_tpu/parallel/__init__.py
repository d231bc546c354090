from .mesh import (encode_mesh, get_encode_mesh, set_encode_mesh,  # noqa: F401
                   shard_blocks, shard_frame_batches, sharded_frame_step)
