from .mesh import encode_mesh, shard_frame_batches, sharded_frame_step  # noqa: F401
