from cream_tpu.core.mesh import create_mesh, batch_sharding, replicated_sharding, shard_batch
from cream_tpu.core.prng import RngStream
