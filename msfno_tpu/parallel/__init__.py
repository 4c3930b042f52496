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

def make_sharded_train_step(*args, **kwargs):
    # lazy import: sharded_train pulls in the trainer (-> models), which
    # itself imports parallel.annotate from this package
    from msfno_tpu.parallel.sharded_train import make_sharded_train_step as f

    return f(*args, **kwargs)
