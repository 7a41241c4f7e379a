from .mesh import make_mesh  # noqa: F401
from .sharded import (  # noqa: F401
    make_sharded_dynamic_step, make_sharded_static_step, stack_batches)
