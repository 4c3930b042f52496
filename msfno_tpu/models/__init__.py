from msfno_tpu.models.sfno.sfnonet import (  # noqa: F401
    FourierNeuralOperatorNet,
    FourierNeuralOperatorNetFilmed,
)


def get_model(*args, **kwargs):
    """Registry entry point (lazy import; see models/registry.py)."""
    from msfno_tpu.models.registry import get_model as f

    return f(*args, **kwargs)
