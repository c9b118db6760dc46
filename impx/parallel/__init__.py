from impx.parallel.mesh import make_mesh, shard_batch, replicate
from impx.parallel import collectives
