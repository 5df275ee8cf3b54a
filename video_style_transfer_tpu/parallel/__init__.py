from video_style_transfer_tpu.parallel.mesh import (  # noqa: F401
    create_mesh, replicate, shard_rows)
