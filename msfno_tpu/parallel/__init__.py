from msfno_tpu.parallel.mesh import (  # noqa: F401
    AXES,
    factorize,
    make_mesh,
    grid_pspec,
    spectral_pspec,
    batch_pspec,
    param_shardings,
)
from msfno_tpu.parallel.annotate import (  # noqa: F401
    use_mesh,
    active_mesh,
    annotate_grid,
    annotate_spectral,
)
from msfno_tpu.parallel.sharded_train import make_sharded_train_step  # noqa: F401
