from velox_tpu.parallel.mesh import make_mesh  # noqa: F401
from velox_tpu.parallel.distributed import DistributedTask  # noqa: F401
