from topo4d_tpu.parallel.mesh import make_view_mesh, shard_view_batch
from topo4d_tpu.parallel.batched import make_batched_geometry_step
