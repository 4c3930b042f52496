from msfno_tpu.models.sfno.sfnonet import (  # noqa: F401
    FourierNeuralOperatorNet,
    FourierNeuralOperatorNetFilmed,
)
